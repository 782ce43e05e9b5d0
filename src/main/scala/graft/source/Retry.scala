package graft.source

/** Driver-side retry with exponential backoff, mirroring the reference's
  * rate-limit handling (reference: src/data/ingestion.py:30-60;
  * base sleep 12 s × 2^attempt, max 3 retries — src/config.py:17-21).
  * Retries only errors matching `retryOn` (the reference greps the error
  * text for "rate limit"); everything else propagates immediately.
  * A dataflow no-op: Spark task retries cover executor failures, this covers
  * driver-side source calls (REST fetch equivalents).
  */
object Retry {

  def withBackoff[T](maxRetries: Int = 3, baseDelayMs: Long = 12000L,
      factor: Double = 2.0, retryOn: String => Boolean = _.toLowerCase.contains("rate limit"),
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception if attempt < maxRetries &&
            retryOn(Option(e.getMessage).getOrElse("")) =>
          sleep((baseDelayMs * math.pow(factor, attempt)).toLong)
          attempt += 1
        case e: Exception => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
