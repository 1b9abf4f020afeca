package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage empirical attribution for named bench/SparkEntry
  * queries (optimization guide §1.1/§7.1 — the UI is disabled in
  * these sessions, so a listener supplies the stage table): after a
  * warm pass, one instrumented pass per query prints every stage's
  * wall, task count, executor-run/CPU time, shuffle read/write bytes
  * and fetch-wait — the "which operator owns the wall" table that
  * decides where optimization effort goes. Not part of the driver
  * contract.
  *
  * Usage: `runMain graft.StageProfile <query> [query ...]` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS set.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-stageprofile")
    spark.sparkContext.setLogLevel("ERROR")

    case class St(name: String, submitted: Long, completed: Long,
                  tasks: Int, runMs: Long, cpuNs: Long,
                  shRead: Long, shWrite: Long, fetchWaitMs: Long,
                  input: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.name.takeWhile(_ != '\n'),
            i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
            i.numTasks, m.executorRunTime, m.executorCpuTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.fetchWaitTime,
            m.inputMetrics.bytesRead)
        }
      }
    }

    args.foreach { name =>
      Bench.prepareFixture(spark, dir, name)
      val fn = Bench.benchOnly.getOrElse(name, SparkEntry.queries(name))
      fn(spark, dir).count() // warm: JIT, codegen, OpCache, listing
      stages.synchronized(stages.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the listener queue before reading the buffer
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $name wall=$wall%.2fs rows=$n =====")
      println(f"${"stage"}%-44s ${"wall_s"}%7s ${"tasks"}%5s ${"run_s"}%7s " +
        f"${"cpu_s"}%7s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"fwait_s"}%7s ${"in_MB"}%7s")
      val snap = stages.synchronized(stages.toList).sortBy(_.submitted)
      snap.foreach { s =>
        println(f"${s.name.take(44)}%-44s ${(s.completed - s.submitted) / 1e3}%7.2f " +
          f"${s.tasks}%5d ${s.runMs / 1e3}%7.2f ${s.cpuNs / 1e9}%7.2f " +
          f"${s.shRead / 1e6}%7.1f ${s.shWrite / 1e6}%7.1f " +
          f"${s.fetchWaitMs / 1e3}%7.2f ${s.input / 1e6}%7.1f")
      }
      val stageWall = snap.map(s => s.completed - s.submitted).sum / 1e3
      println(f"stages=${snap.size} sum(stage walls)=$stageWall%.2fs " +
        f"(gaps = driver/planning time = ${math.max(0, wall - stageWall)}%.2fs" +
        " if stages were serial; overlapping stages overstate the sum)")
      graft.operators.OpCache.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
