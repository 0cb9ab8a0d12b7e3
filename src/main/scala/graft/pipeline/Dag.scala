package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future, Promise}
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success}

/** Minimal DAG scheduler for Spark jobs — the orchestration layer the
  * reference delegates to Airflow (task graphs like `read >> transform
  * >> enrich >> persist` with a fan-in barrier,
  * /root/reference/parallelized_data_pipeline_dag.py:433-434, and
  * trigger rules / retry config at :85-97).
  *
  * Semantics carried over from the reference:
  *   - edges = dependencies; a node runs when ALL upstreams succeeded
  *     (Airflow's ALL_SUCCESS trigger rule, the only one the reference
  *     uses);
  *   - independent nodes run concurrently (the "parallelized" entity
  *     branches) on the caller's ExecutionContext — Spark actions issued
  *     from different threads become concurrent Spark jobs;
  *   - a node failure skips its downstream transitively
  *     (upstream_failed state), runs an `onFailure` callback (the Slack
  *     alert hook, dag_utils.py:8-35), and fails the run after every
  *     runnable node finishes — like Airflow, independent branches still
  *     complete;
  *   - per-node retries with fixed delay (:88-90 — the reference
  *     configures retries=0 with a 30-min delay; both are per-DAG
  *     config here).
  *
  * The scheduler is deliberately driver-side control-plane only: nodes
  * do Spark actions; no data flows through the scheduler.
  */
object Dag {

  sealed trait NodeState
  case object Succeeded extends NodeState
  final case class FailedState(error: Throwable, attempts: Int) extends NodeState
  case object UpstreamFailed extends NodeState

  /** Note: retryDelay burns wall-clock inside the node's DEADLINE, not
    * its thread — size `run(timeout)` to cover `(retries + 1) *
    * (nodeTime + retryDelay)` for the slowest chain (the reference's
    * 30-min delay config needs a correspondingly larger timeout). The
    * delay itself is a timer tick: no ExecutionContext thread is parked
    * while a node waits to retry, so a pool sized for the node
    * concurrency needs no extra headroom for waiting retries.
    */
  final case class Spec(
      nodes: Map[String, () => Unit],
      edges: Seq[(String, String)], // (upstream, downstream)
      retries: Int = 0,
      retryDelay: FiniteDuration = 0.seconds,
      onFailure: (String, Throwable) => Unit = (_, _) => (),
  ) {
    require(edges.forall { case (a, b) => nodes.contains(a) && nodes.contains(b) },
      "edge endpoints must be declared nodes")
  }

  /** One shared daemon timer thread serves every retry delay in the
    * JVM — delays are O(1) control-plane ticks, so a single thread
    * handles any number of concurrently waiting nodes.
    */
  private val retryTimer = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
    (r: Runnable) => {
      val t = new Thread(r, "graft-dag-retry-timer")
      t.setDaemon(true)
      t
    })

  private def delayTick(d: FiniteDuration): Future[Unit] =
    if (d.toMillis <= 0) Future.successful(())
    else {
      val p = Promise[Unit]()
      retryTimer.schedule(
        new Runnable { def run(): Unit = p.success(()) },
        d.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
      p.future
    }

  final case class RunResult(states: Map[String, NodeState]) {
    def succeeded: Boolean = states.values.forall(_ == Succeeded)
  }

  /** Validate acyclicity (topological order exists). */
  def topoOrder(spec: Spec): Seq[String] = {
    val indeg = mutable.Map(spec.nodes.keys.map(_ -> 0).toSeq: _*)
    spec.edges.foreach { case (_, b) => indeg(b) += 1 }
    val queue = mutable.Queue(spec.nodes.keys.filter(indeg(_) == 0).toSeq.sorted: _*)
    val order = mutable.ArrayBuffer[String]()
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      order += n
      spec.edges.collect { case (`n`, b) => b }.sorted.foreach { b =>
        indeg(b) -= 1
        if (indeg(b) == 0) queue.enqueue(b)
      }
    }
    require(order.size == spec.nodes.size, s"cycle detected among ${spec.nodes.keySet -- order}")
    order.toSeq
  }

  def run(spec: Spec, timeout: FiniteDuration = 10.minutes)(implicit ec: ExecutionContext): RunResult = {
    topoOrder(spec) // cycle check up front
    val upstreams: Map[String, Seq[String]] =
      spec.nodes.keys.map(n => n -> spec.edges.collect { case (a, `n`) => a }).toMap
    val done = mutable.Map[String, Promise[NodeState]](
      spec.nodes.keys.map(_ -> Promise[NodeState]()).toSeq: _*)
    val states = new ConcurrentLinkedQueue[(String, NodeState)]

    // the alert hook is external I/O (webhook): a throwing hook must
    // never take the scheduler down with it or double-fire
    def alertSafely(name: String, e: Throwable): Unit =
      try spec.onFailure(name, e)
      catch { case hookErr: Throwable =>
        System.err.println(s"[dag] onFailure hook failed for $name: ${hookErr.getMessage}")
      }

    // catches ALL throwables (Try/NonFatal would let e.g. a
    // StackOverflowError escape the Future and the node would vanish
    // from `states`, turning a failed run into a vacuous success).
    // A retry waits on the shared timer (delayTick), NOT with a
    // Thread.sleep on the pool: a 30-min reference-style delay must not
    // park an ExecutionContext thread per waiting node. The body itself
    // always runs on the caller's ExecutionContext (the flatMap below),
    // never on the timer thread.
    def attempt(name: String, body: () => Unit, attemptsLeft: Int, attemptNo: Int): Future[NodeState] =
      (try { body(); None } catch { case e: Throwable => Some(e) }) match {
        case None => Future.successful(Succeeded)
        case Some(_) if attemptsLeft > 0 =>
          delayTick(spec.retryDelay)
            .flatMap(_ => attempt(name, body, attemptsLeft - 1, attemptNo + 1))
        case Some(e) =>
          alertSafely(name, e)
          Future.successful(FailedState(e, attemptNo))
      }

    spec.nodes.foreach { case (name, body) =>
      val upstreamDone = Future.sequence(upstreams(name).map(done(_).future))
      val result: Future[NodeState] = upstreamDone.flatMap { ups =>
        if (ups.forall(_ == Succeeded)) attempt(name, body, spec.retries, 1)
        else Future.successful(UpstreamFailed)
      }.map { state =>
        states.add(name -> state)
        state
      }
      result.onComplete {
        case Success(s) => done(name).success(s)
        case Failure(e) =>
          // scheduler-level failure (not the node body — attempt() catches
          // all of those): record it, complete the promise FIRST so the
          // run can never hang on a throwing hook, then alert
          val st = FailedState(e, 1)
          states.add(name -> st)
          done(name).success(st)
          alertSafely(name, e)
      }
    }

    Await.result(Future.sequence(done.values.map(_.future)), timeout)
    RunResult(states.asScala.toMap)
  }
}
