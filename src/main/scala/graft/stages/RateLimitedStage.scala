package graft.stages

/** Token-interval rate limiting for fetch/inference stages (reference
  * §2.12: 20 requests/min with a lock at
  * /root/reference/vton_scraper/advanced_scraper.py:24-40, random
  * inter-request delays at zalando_gallery_scraper_s3.py:129-131).
  *
  * The limit is per partition — with P parallel partitions the aggregate
  * rate is P × perPartitionPerSecond, so callers size it as
  * targetGlobalRate / expected parallelism (the same arithmetic a
  * distributed scraper fleet does). Spark has no cross-executor limiter
  * without external coordination, and a driver-side one would serialize
  * the job; per-partition token pacing is the scalable shape.
  */
object RateLimitedStage {

  def wrap[I, O](inner: InferenceStage[I, O],
      perPartitionPerSecond: Double): InferenceStage[I, O] =
    new InferenceStage[I, O] {
      def setup(): ModelHandle[I, O] = {
        val handle = inner.setup()
        val intervalNanos = (1e9 / perPartitionPerSecond).toLong
        new ModelHandle[I, O] {
          private var nextAllowed = 0L
          def infer(in: I): O = {
            val now = System.nanoTime()
            if (now < nextAllowed) {
              val waitMs = (nextAllowed - now) / 1000000L
              if (waitMs > 0) Thread.sleep(waitMs)
            }
            nextAllowed = math.max(now, nextAllowed) + intervalNanos
            handle.infer(in)
          }
        }
      }
    }
}
