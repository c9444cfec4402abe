package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Service-mode embedding operator (reference `createEmbeddings`,
  * doc2vec.ts:2010-2041 + the retry loop at doc2vec.ts:275-356): the
  * batched-HTTP path the hermetic `Embedder` stands in for. The
  * transport is a pluggable function so the operator is testable
  * offline; a real client (HTTP pool per partition) drops into the
  * same slot.
  *
  * Contract preserved from the reference:
  *   - 32 764-char pre-truncation safety net before any call;
  *   - micro-batches of `batchSize` texts per call (the reference
  *     embedded ONE chunk per call, doc2vec.ts:1980 — batching is the
  *     documented improvement);
  *   - rate-limit replies carry a Retry-After delay; the batch retries
  *     up to `maxRetries` with that delay (parseRetryAfter semantics:
  *     floor 1s);
  *   - a batch that still fails emits EMPTY vectors for its chunks —
  *     skipped-but-logged, never a poisoned job (doc2vec.ts:2036-2040).
  *
  * Scale: one transport instance per partition (`mapPartitions`), batch
  * boundaries never cross partitions; throughput scales with executors
  * × batchSize × `concurrency`. An embedding service call is
  * latency-bound, not CPU-bound, so a single in-flight call per
  * partition leaves the connection idle between round-trips — the
  * second documented improvement over the reference's serial loop.
  * `concurrency` N keeps up to N micro-batches in flight per partition
  * through a bounded FIFO of futures; results are emitted in SUBMISSION
  * order regardless of completion order, so the output is byte-for-byte
  * identical to the serial path (asserted in ServiceEmbedderSpec) and
  * downstream hash-based change detection never sees call-timing
  * nondeterminism. The expensive stage still sees only the chunk delta
  * the sync layers let through.
  */
object ServiceEmbedder {

  /** One call outcome: vectors for the batch, a rate-limit with a
    * retry delay, or a hard failure. */
  sealed trait Reply
  final case class Vectors(vecs: Seq[Array[Float]]) extends Reply
  final case class RateLimited(retryAfterMs: Long) extends Reply
  final case class Failed(reason: String) extends Reply

  type Transport = Seq[String] => Reply

  /** One micro-batch through the transport with the full retry
    * contract; returns the output rows for the batch in input order. */
  private def callBatch(batch: Seq[(Long, String)], transport: Transport,
      maxRetries: Int, sleep: Long => Unit): Seq[(Long, Array[Float], Boolean)] = {
    val texts = batch.map { case (_, t) =>
      if (t.length > Embedder.MaxChars) t.substring(0, Embedder.MaxChars)
      else t
    }
    var attempt = 0
    var result: Option[Seq[Array[Float]]] = None
    var done = false
    while (!done) {
      transport(texts) match {
        // a partial reply (fewer vectors than texts) is a transport
        // bug: treat as failed — zip would silently DROP the tail,
        // violating the skipped-but-visible contract
        case Vectors(vs) if vs.length == batch.length =>
          result = Some(vs); done = true
        case Vectors(_) => done = true
        case RateLimited(ms) if attempt < maxRetries =>
          attempt += 1
          sleep(math.max(1000L, ms)) // reference floor: 1s
        case _ => done = true // Failed, or retries exhausted
      }
    }
    result match {
      case Some(vs) =>
        batch.zip(vs).map { case ((id, _), v) => (id, v, true) }
      case None =>
        // failed batch: empty vectors, chunk skipped but visible
        batch.map { case (id, _) => (id, Array.empty[Float], false) }
    }
  }

  /** (id, text) → (id, embedding, ok): batched per partition through
    * `transport`; `sleep` is injectable so tests run without waiting.
    * `concurrency` > 1 pipelines that many micro-batches per partition
    * (output order unchanged — see the scale note above).
    *
    * THREAD SAFETY: with `concurrency` > 1 the single `transport`
    * closure (and `sleep`) is invoked from up to `concurrency` pool
    * threads at once within a partition — it must be thread-safe (a
    * pooled HTTP client is; a stateful single-connection client is
    * NOT). For a transport that isn't, pass `transportFactory`
    * instead: each worker THREAD lazily builds its own instance
    * (thread-confined, never shared), restoring the one-caller-per-
    * transport contract of the serial path. When both are given the
    * factory wins.
    *
    * DISPOSAL: a factory-built transport that holds resources (a
    * single persistent connection, a file handle) is released through
    * `releaseTransport`, invoked once per built instance when the
    * partition's task COMPLETES (success, failure, or cancellation —
    * via TaskContext.addTaskCompletionListener, so early terminations
    * that never drain the iterator still clean up). The default is a
    * no-op, correct for pure-function transports. The worker pool is
    * shut down on the same hook, closing the leak where a partially
    * consumed partition iterator abandoned live worker threads. */
  def embedBatched(s: SparkSession, input: Dataset[(Long, String)],
      transport: Transport, batchSize: Int = 32, maxRetries: Int = 3,
      concurrency: Int = 1,
      sleep: Long => Unit = ms => Thread.sleep(ms),
      transportFactory: Option[() => Transport] = None,
      releaseTransport: Transport => Unit = _ => ()): DataFrame = {
    import s.implicits._
    require(concurrency >= 1, s"concurrency must be >= 1, got $concurrency")
    input.mapPartitions { it =>
      val built =
        new java.util.concurrent.ConcurrentLinkedQueue[Transport]()
      val effective: Transport = transportFactory match {
        case Some(f) =>
          val tl = ThreadLocal.withInitial { () =>
            val t = f(); built.add(t); t
          }
          texts => tl.get()(texts)
        case None => transport
      }
      // release every factory-built instance exactly once at task end;
      // outside a task (driver-local unit tests) fall back to releasing
      // whatever was built when the iterator is fully drained
      def releaseAll(): Unit = {
        var t = built.poll()
        while (t != null) { releaseTransport(t); t = built.poll() }
      }
      val inTask = Option(org.apache.spark.TaskContext.get())
      inTask.foreach(_.addTaskCompletionListener[Unit](_ => releaseAll()))
      def withDrainRelease[T](base: Iterator[T]): Iterator[T] =
        if (inTask.isDefined) base
        else new Iterator[T] {
          def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) releaseAll()
            h
          }
          def next(): T = base.next()
        }
      val batches = it.grouped(batchSize)
      if (concurrency == 1)
        withDrainRelease(
          batches.flatMap(callBatch(_, effective, maxRetries, sleep)))
      else {
        // Bounded pipeline: at most `concurrency` transport calls in
        // flight; the FIFO dequeues (and therefore emits) strictly in
        // submission order, so faster later batches wait their turn.
        // Retry sleeps occupy their worker slot — a rate-limited
        // partition degrades toward serial throughput instead of
        // hammering the service with more traffic.
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          concurrency,
          (r: Runnable) => {
            val t = new Thread(r, "graft-embed-worker")
            t.setDaemon(true)
            t
          })
        // a cancelled/failed task never reaches the drain-time
        // shutdown below — reap the workers on task completion too
        inTask.foreach(_.addTaskCompletionListener[Unit](_ =>
          pool.shutdownNow()))
        val ec = ExecutionContext.fromExecutorService(pool)
        val inFlight =
          new scala.collection.mutable.Queue[Future[Seq[(Long, Array[Float], Boolean)]]]()
        def fill(): Unit =
          while (inFlight.size < concurrency && batches.hasNext) {
            val b = batches.next()
            inFlight.enqueue(Future(callBatch(b, effective, maxRetries, sleep))(ec))
          }
        withDrainRelease(new Iterator[Seq[(Long, Array[Float], Boolean)]] {
          def hasNext: Boolean = {
            fill()
            if (inFlight.isEmpty) { pool.shutdown(); false } else true
          }
          def next(): Seq[(Long, Array[Float], Boolean)] = {
            if (!hasNext) throw new NoSuchElementException
            val head = Await.result(inFlight.dequeue(), Duration.Inf)
            fill()
            head
          }
        }.flatten)
      }
    }.toDF("id", "embedding", "ok")
  }
}
