package graft.stages

/** Outcome of running a stage on one row under retry: the value (if any
  * attempt succeeded), how many attempts it took, and the last error
  * otherwise. Failed rows become data, not job failures — the reference's
  * skip-and-log semantics (/root/reference/prompts_parser.py:81-83) and
  * A5 success/failure accounting.
  */
final case class Attempted[O](value: Option[O], attempts: Int,
    lastError: String) {
  def succeeded: Boolean = value.isDefined
}

/** Retry-with-exponential-backoff wrapper around any InferenceStage
  * (reference §2.12 late/failed-data handling: 1,2,4s backoff on
  * transient errors at /root/reference/test_kimono.py:87-99, cooldown at
  * vton_scraper/config.py:74-78).
  *
  * Task-level notes: retries are per-row inside the partition, so one
  * flaky input doesn't fail the Spark task (which would re-run the whole
  * partition — including the expensive model setup). Spark's own task
  * retry remains the outer safety net for machine-level failures.
  */
object RetryStage {

  def wrap[I, O](inner: InferenceStage[I, O], maxAttempts: Int,
      baseBackoffMs: Long): InferenceStage[I, Attempted[O]] =
    new InferenceStage[I, Attempted[O]] {
      def setup(): ModelHandle[I, Attempted[O]] = {
        val handle = inner.setup()
        new ModelHandle[I, Attempted[O]] {
          def infer(in: I): Attempted[O] = {
            var attempt = 0
            var lastError = ""
            while (attempt < maxAttempts) {
              attempt += 1
              try return Attempted(Some(handle.infer(in)), attempt, "")
              catch {
                case e: Exception =>
                  lastError = s"${e.getClass.getSimpleName}: ${e.getMessage}"
                  if (attempt < maxAttempts && baseBackoffMs > 0)
                    Thread.sleep(baseBackoffMs << (attempt - 1))
              }
            }
            Attempted(None, attempt, lastError)
          }
        }
      }
    }
}
