package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the shared TPC-H-ish star schema + documents/embeddings
  * (TESTDATA.md / FIXTURES.md §3). Plain parquet scans — Catalyst pushes
  * filters and prunes columns into them.
  */
object Tables {
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/part.parquet")
  def nation(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/region.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
