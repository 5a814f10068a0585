package graft.errors

import scala.annotation.tailrec

/** User-exception fidelity (reference: core.py:106-110,166-172,329-338;
  * contract tested at tests/test_pandarallel.py:167-174 — the *original*
  * exception class must surface, not the harness wrapper).
  *
  * Spark wraps task failures in `SparkException` chains; [[userCause]]
  * walks the cause chain to the innermost non-Spark throwable, and
  * [[rethrowUser]] raises it, preserving the reference's "worker
  * re-raises the user's error on the driver" behavior.
  */
object Propagation {

  private def isHarness(t: Throwable): Boolean = {
    val n = t.getClass.getName
    n.startsWith("org.apache.spark") || n.startsWith("java.util.concurrent")
  }

  /** Innermost non-Spark cause, or the original throwable if none. */
  @tailrec
  def userCause(t: Throwable): Throwable =
    if (!isHarness(t)) t
    else
      t.getCause match {
        case null => t
        case c => userCause(c)
      }

  /** Run `body`; on failure rethrow the user's own exception. */
  def rethrowUser[T](body: => T): T =
    try body
    catch {
      case t: Throwable =>
        val u = userCause(t)
        if (u ne t) throw u else throw t
    }
}
