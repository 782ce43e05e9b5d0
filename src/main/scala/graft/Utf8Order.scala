package graft

/** Orders strings by their UTF-8 byte sequence — exactly Spark's
  * `UTF8String.compareTo` and DuckDB's binary collation. Java's default
  * `String.compareTo` (UTF-16 code units) diverges from this whenever a
  * supplementary-plane code point (surrogate pair, code units 0xD800+)
  * compares against one in U+E000..U+FFFF, so every driver-side tie-break
  * that must agree with an engine-side ORDER BY goes through this ordering.
  */
object Utf8Order {
  val ofString: Ordering[String] = (x: String, y: String) =>
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
