package graft.etl

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** Shared ETL-job helpers. */
object Etl {

  /** Await EVERY future — success or failure — then rethrow the first
    * failure. `Await(Future.sequence(...))` fails fast instead, which
    * would return control (and the output directory) to the caller
    * while sibling sink jobs are still writing into it; draining all
    * outcomes first guarantees no orphaned write survives the call. */
  def awaitAll(fs: Seq[Future[_]])(implicit ec: ExecutionContext): Unit = {
    val settled: Seq[Try[Any]] =
      Await.result(
        Future.sequence(fs.map(_.transform(t => Success(t)))), Duration.Inf)
    settled.collectFirst { case Failure(e) => throw e }
    ()
  }
}
