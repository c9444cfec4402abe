package graft.sources

/** Retry classification of the reference's API clients (GitHub
  * `requestWithRetry`, doc2vec.ts:275-356): network errors (no status),
  * 5xx, and 429 retry; a 403 retries ONLY when the rate-limit headers
  * prove exhaustion (`x-ratelimit-remaining: 0` plus a reset
  * timestamp) — any other 403 and every other 4xx is deterministic and
  * fails fast without burning retries (the upstream suite pins 422 and
  * 404 to exactly one attempt). Pure functions: the I/O client inside
  * `mapPartitions` consults them, tests cover them without a network. */
object RetryPolicy {

  /** Transient-failure test: None = network error/timeout (no HTTP
    * status), otherwise 5xx or 429. */
  def isRetryableStatus(status: Option[Int]): Boolean =
    status.forall(s => s >= 500 || s == 429)

  /** GitHub-style 403 rate-limit wait: Some(delayMs) when the headers
    * prove exhaustion (remaining == "0" and a parseable epoch-seconds
    * reset), floored at 1 s even when the reset is already past;
    * None = a genuine 403, fail fast. `nowMs` is a parameter, not a
    * clock read, so the classification stays deterministic.
    *
    * Reset parsing follows the reference's `parseInt(resetTime, 10)`
    * (doc2vec.ts:300) for every NUMERIC header: an optionally-signed
    * leading digit run is honored even with trailing junk
    * ("1700000060\n", "1700000060;burst", "-5" → the 1 s floor), so a
    * header the reference would wait on is never misread as a genuine
    * 403. One deliberate divergence: a reset with no digits at all
    * ("soon") is parseInt-NaN, which the reference accidentally turns
    * into an immediate retry (setTimeout(NaN) fires at once); graft
    * instead fails fast as a genuine 403 — an unparseable header is
    * evidence against proven exhaustion, not for it. */
  def rateLimitWaitMs(status: Int, rateLimitRemaining: Option[String],
      rateLimitResetEpochS: Option[String], nowMs: Long): Option[Long] =
    if (status == 403 && rateLimitRemaining.contains("0"))
      rateLimitResetEpochS
        .map(_.trim)
        .map { s =>
          val sign = if (s.startsWith("-") || s.startsWith("+")) 1 else 0
          s.take(sign) + s.drop(sign).takeWhile(_.isDigit)
        }
        .filter(_.exists(_.isDigit)).flatMap(_.toLongOption)
        .map(reset => math.max(1000L, reset * 1000L - nowMs))
    else None

  private val NetworkErrorCodes = Set("ENOTFOUND", "ECONNREFUSED",
    "ETIMEDOUT", "ECONNRESET", "EHOSTUNREACH", "ENETUNREACH")

  private val NetworkMessageTerms =
    Seq("getaddrinfo", "network", "timeout", "connection", "dns")

  /** Network-error classification (reference `isNetworkError`,
    * content-processor.ts:951-982): a known transport error code, a
    * client error carrying NO HTTP response (`hadResponse = false` with
    * `isTransportError = true`), or a network-looking message term.
    * This is the bit that flips `hasNetworkErrors` and thereby VETOES
    * obsolete-chunk cleanup — misclassifying a network outage as a
    * content change would purge the whole store, so the reference errs
    * broad on message terms and this mirrors it exactly. */
  def isNetworkError(code: Option[String], message: Option[String],
      isTransportError: Boolean = false,
      hadResponse: Boolean = false): Boolean = {
    if (code.exists(NetworkErrorCodes.contains)) return true
    if (isTransportError && !hadResponse) return true
    val msg = message.getOrElse("").toLowerCase
    NetworkMessageTerms.exists(msg.contains)
  }
}
