package graft.etl

/** Retry policy parity (reference D2: retries=1, retry_delay=5min,
  * ETL_DAG.py:242-248) as a minimal wrapper for driver-side stages. */
object Retry {
  def withRetry[T](retries: Int, delayMs: Long = 0)(f: => T): T = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      try return f
      catch {
        case e: Throwable =>
          last = e
          attempt += 1
          if (attempt <= retries && delayMs > 0) Thread.sleep(delayMs)
      }
    }
    throw last
  }
}
