package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The reference queue consumer's disposition taxonomy, applied to errors
  * that surface INSIDE the pipeline (after a message was admitted).
  *
  * The reference classifies every processing failure before acking:
  * `NonRetryableException → basic_reject(requeue=False)` (drop to
  * dead-letter), anything transient → `basic_nack` (requeue)
  * (`sam_extract/main.py:711-735`, `exceptions/Exceptions.py:16-42`).
  * [[FileQueueSource]] applies the same taxonomy at DISCOVERY (unreadable /
  * missing-input messages never enter the stream); this object covers the
  * second failure surface: an ADMITTED granule whose processing trips an
  * analysis-time guard — e.g. the degenerate-region ceiling
  * ([[graft.domain.GlobalPipeline.MaxRegionPixelsConfKey]] under
  * `oversizeRegions=fail`) or a malformed-conf `IllegalArgumentException`.
  * Without classification such an error is a POISON MESSAGE: the
  * micro-batch fails, Spark replays it from the checkpoint, it fails again
  * — a crash loop that wedges the whole queue behind one bad granule.
  * [[MicroBatchIngest.ingestQueue]] catches the batch failure, asks
  * [[nonRetryable]], and either dead-letters the message and continues the
  * stream (reject) or rethrows so Spark's checkpoint replay requeues it
  * (nack).
  */
object Disposition {

  /** The full cause chain of `t`, cycle-safe, outermost first. */
  def causes(t: Throwable): List[Throwable] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Throwable]
    var cur  = t
    while (cur != null && seen.add(cur)) cur = cur.getCause
    seen.toList
  }

  /** Deterministic-failure classification — replaying the same bytes can
    * only fail the same way:
    *  - `raise_error` guards (Spark condition USER_RAISED_EXCEPTION): every
    *    in-pipeline scale/sanity guard in this engine raises through it
    *    (region ceiling, Zarr bounds, sessionize strict mode);
    *  - `IllegalArgumentException` RAISED BY THIS ENGINE (the first
    *    non-JDK/non-scala frame below the throw site is `graft.` — see
    *    [[graftRaised]]): malformed conf, argument validation, or a JDK
    *    primitive fed bad graft arguments (`parseLong` on malformed
    *    metadata — NumberFormatException IS an IAE). The reference
    *    rejects only ITS OWN NonRetryable taxonomy
    *    (`exceptions/Exceptions.py:16-42`); IAE is ubiquitous in JVM/Spark
    *    internals and can be transient (racy config, library edge cases),
    *    so a blanket IAE match could permanently dead-letter a good
    *    granule — IAEs whose first library frame is Spark/Hadoop/other
    *    stay transient (requeue);
    *  - `AnalysisException`: a granule whose decoded schema doesn't bind
    *    the pipeline's columns;
    *  - `FileNotFoundException`: the input vanished after admission —
    *    redelivery cannot bring it back (the reference's
    *    `__validate_files` NonRetryable).
    * Everything else (executor loss, I/O hiccups, OOM) is transient:
    * requeue via Spark's own checkpoint replay. */
  def nonRetryable(t: Throwable): Boolean = causes(t).exists {
    case e: org.apache.spark.SparkThrowable
        if e.getCondition == "USER_RAISED_EXCEPTION" => true
    case _: org.apache.spark.sql.AnalysisException   => true
    case e: IllegalArgumentException if graftRaised(e) => true
    case _: java.io.FileNotFoundException            => true
    case _                                           => false
  }

  /** Did this engine raise `e`? Classified by the THROW SITE, not the whole
    * stack: most executor/driver work runs under graft lambdas, so a
    * third-party IAE thrown anywhere beneath graft-invoked code would still
    * carry graft frames further down — a whole-stack match would classify
    * it non-retryable and permanently dead-letter a granule whose failure
    * was transient. Instead we walk down from the throw site past
    * JDK/scala frames and ask whether the FIRST library frame is `graft.`:
    *  - a graft `require` guard (`scala.Predef$` over the graft caller)
    *    and a JDK-raised IAE fed by graft arguments (`Long.parseLong` on
    *    malformed metadata, TimSort's contract violation under a graft
    *    comparator — NumberFormatException IS an IAE) both attribute to
    *    graft: replaying the same bytes fails the same way, and an
    *    infinite requeue would wedge the queue where a dead-letter stays
    *    operator-recoverable via redrive;
    *  - an IAE whose first library frame is Spark/Hadoop/any other
    *    non-graft package classifies transient (requeue), even when graft
    *    invoked it — third-party IAEs can be racy-config artifacts, and a
    *    wrong dead-letter there would discard a good granule.
    * Exceptions carried back from executors keep their original
    * throw-site frames, so the check survives serialization. */
  private[streaming] def graftRaised(e: Throwable): Boolean =
    e.getStackTrace.iterator
      .find { f =>
        val c = f.getClassName
        !(c.startsWith("java.") || c.startsWith("jdk.") || c.startsWith("sun.") ||
          c.startsWith("scala."))
      }
      .exists(_.getClassName.startsWith("graft."))

  /** `basic_reject(requeue=False)`: move a message file out of the queue to
    * `<queue>/.deadletter/` with a `<name>.reason` sidecar carrying the
    * guard message. Idempotent — a replayed reject is a no-op move (the
    * reason sidecar is rewritten). */
  def deadLetter(queueDir: String, name: String, cause: Throwable, conf: Configuration): Unit = {
    val q    = new Path(queueDir)
    val fs   = q.getFileSystem(conf)
    val dead = new Path(q, ".deadletter")
    fs.mkdirs(dead)
    val src = new Path(q, name)
    if (fs.exists(src)) fs.rename(src, new Path(dead, name))
    val reason = new Path(dead, s"$name.reason")
    val out    = fs.create(reason, true)
    try out.write(
      (causes(cause).map(c => s"${c.getClass.getName}: ${c.getMessage}").mkString("\n") + "\n")
        .getBytes("UTF-8"))
    finally out.close()
    // driver-side and rare: a visible one-liner beats a logger dependency
    println(s"graft.streaming: non-retryable failure — dead-lettered message '$name': ${cause.getMessage}")
  }

  /** Is this message already dead-lettered? (A replayed batch must not
    * re-process a rejected message.) */
  def isDead(queueDir: String, name: String, conf: Configuration): Boolean = {
    val fs = new Path(queueDir).getFileSystem(conf)
    fs.exists(new Path(new Path(new Path(queueDir), ".deadletter"), name))
  }

  /** Re-queue every dead-lettered message (`RepairJob --redrive`): move it
    * out of `.deadletter/` back into the queue under `<name>.redrive` and
    * drop its `.reason` sidecar — the operational analog of manually
    * redelivering after the reference's `basic_reject(requeue=False)`
    * once the operator has fixed the conf that poisoned it. The RENAME
    * matters: the queue source's offset log is keyed by message name, so
    * re-entering under the original name inside a live checkpoint would
    * be skipped at discovery yet swept into `.acked` unprocessed; a fresh
    * name is a fresh message. Idempotent — a second redrive finds an
    * empty `.deadletter/` and is a no-op; a message whose target name
    * already exists in the queue is left in place. Returns the re-queued
    * names. */
  def redrive(queueDir: String, conf: Configuration): Seq[String] = {
    val q    = new Path(queueDir)
    val fs   = q.getFileSystem(conf)
    val dead = new Path(q, ".deadletter")
    if (!fs.exists(dead)) return Nil
    val moved = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(dead).toSeq.map(_.getPath).sortBy(_.getName).foreach { p =>
      val name = p.getName
      if (!name.startsWith(".") && !name.endsWith(".reason") && !name.endsWith(".crc")) {
        val dst = new Path(q, s"$name.redrive")
        if (!fs.exists(dst) && fs.rename(p, dst)) {
          fs.delete(new Path(dead, s"$name.reason"), false)
          moved += dst.getName
        }
      }
    }
    moved.toSeq
  }
}
