package graft

import org.apache.spark.sql.SparkSession
import graft.serve.StatusServer
import graft.streaming.{RunStatusListener, StreamingIngest}

/** The reference's application lifespan as a runnable main —
  * `app/main.py:40-95`: an initial fetch at startup, then a scheduled
  * re-fetch on an interval OR cron trigger, with the HTTP status
  * surface live throughout.  This is the in-engine scheduler entry
  * point: each scheduled run is one `Trigger.AvailableNow` drain of
  * the source (the Spark idiom for "fetch whatever is new, then
  * stop"), checkpointed so every run is incremental and a crashed run
  * redelivers.
  *
  * Usage:
  *   runMain graft.Serve <srcDir> <workDir> [port] [trigger] [maxRuns]
  * where trigger is `interval:<seconds>` (ref SCHEDULE_TRIGGER=interval,
  * minutes→seconds for demo granularity) or `cron:<HH>:<MM>` (UTC, ref
  * SCHEDULE_TRIGGER=cron), default `interval:60`; maxRuns bounds the
  * scheduled re-runs (0 = run forever), so the demo main terminates.
  */
object Serve {

  /** Scheduling policy — the two trigger shapes the reference's
    * `SCHEDULE_TRIGGER` setting selects (`app/main.py:53-66`). */
  sealed trait ServeTrigger
  final case class Interval(seconds: Long) extends ServeTrigger {
    require(seconds > 0, "interval must be positive")
  }
  final case class Cron(hour: Int, minute: Int) extends ServeTrigger {
    require(hour >= 0 && hour < 24 && minute >= 0 && minute < 60,
      s"invalid cron time $hour:$minute")
  }

  /** Milliseconds from `nowUtcMs` to the next fire — pure, spec-able.
    * Interval fires a fixed delay after the previous run completes
    * (APScheduler's IntervalTrigger semantics are fixed-rate, but
    * after-completion is the safe choice for a drain that may outlast
    * the interval: runs never overlap, matching
    * `max_instances=1`-style defaults).  Cron fires at the next
    * HH:MM UTC strictly after now. */
  def nextDelayMs(trigger: ServeTrigger, nowUtcMs: Long): Long =
    trigger match {
      case Interval(s) => s * 1000L
      case Cron(h, m) =>
        val now = java.time.Instant.ofEpochMilli(nowUtcMs)
          .atZone(java.time.ZoneOffset.UTC)
        val todayFire = now.toLocalDate.atTime(h, m)
          .atZone(java.time.ZoneOffset.UTC)
        val fire =
          if (todayFire.toInstant.toEpochMilli > nowUtcMs) todayFire
          else todayFire.plusDays(1)
        fire.toInstant.toEpochMilli - nowUtcMs
    }

  def parseTrigger(s: String): ServeTrigger = s.split(":").toSeq match {
    case Seq("interval", sec) => Interval(sec.toLong)
    case Seq("cron", h, m) => Cron(h.toInt, m.toInt)
    case _ => throw new IllegalArgumentException(
      s"invalid trigger '$s' (want interval:<seconds> or cron:<HH>:<MM>)")
  }

  /** One scheduled run: drain whatever is new from the source into the
    * store (checkpoint-incremental), publishing summary events. */
  def runOnce(spark: SparkSession, srcDir: String, workDir: String): Unit = {
    val (q, qq) = StreamingIngest.start(spark, srcDir,
      s"$workDir/bars", s"$workDir/ckpt",
      eventsDir = Some(s"$workDir/events"),
      quarantineDir = Some(s"$workDir/quarantine"))
    q.awaitTermination()
    qq.foreach(_.awaitTermination())
  }

  /** The lifespan loop: initial fetch, then `maxRuns` scheduled
    * re-runs (0 = forever).  `sleeper` is injectable so specs can run
    * the loop without wall-clock waits and record the delays the
    * scheduler computed. */
  def runLoop(spark: SparkSession, srcDir: String, workDir: String,
      trigger: ServeTrigger, maxRuns: Int,
      sleeper: Long => Unit = Thread.sleep,
      nowUtcMs: () => Long = () => System.currentTimeMillis()): Unit = {
    // ref app/main.py:48: first fetch happens immediately at startup
    runOnce(spark, srcDir, workDir)
    var runs = 0
    while (maxRuns == 0 || runs < maxRuns) {
      sleeper(nextDelayMs(trigger, nowUtcMs()))
      runOnce(spark, srcDir, workDir)
      runs += 1
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Serve <srcDir> <workDir> [port] [trigger] [maxRuns]")
    val srcDir = args(0)
    val workDir = args(1)
    val port = if (args.length > 2) args(2).toInt else 0
    val trigger =
      parseTrigger(if (args.length > 3) args(3) else "interval:60")
    val maxRuns = if (args.length > 4) args(4).toInt else 0
    val spark = GraftSession.build("graft-serve")
    val listener = new RunStatusListener
    spark.streams.addListener(listener)
    val server = new StatusServer(spark, s"$workDir/bars", listener)
    val boundPort = server.start(port)
    // the status surface is live from before the first fetch, like the
    // reference's ASGI server accepting health checks during startup
    println(s"graft.Serve listening on http://127.0.0.1:$boundPort")
    try runLoop(spark, srcDir, workDir, trigger, maxRuns)
    finally {
      server.stop()
      spark.streams.removeListener(listener)
      spark.stop()
    }
  }
}
