package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential-sensitivity evidence for the r16 shuffle-floor sentinel
  * (VERDICT r15 #1): the r15 drift mode carried corpus rows 3-9x with
  * CLEAN CPU sentinels — the canary kernel is a 2.5 MB cache-resident
  * scan that barely touches the resources the corpus blocks live on.
  * This probe measures the CPU sentinel and the frozen shuffle kernel
  * (the exact `Bench.shuffleFloor` shape) idle, then under a pure
  * DRAM-BANDWIDTH antagonist (N threads running the bandwidth canary's
  * triad sweep in a loop — no extra cache pressure on the canary's own
  * block, just memory-bus saturation), and reports both ratios: the
  * shuffle kernel must degrade PAST the 1.5x drift gate while the CPU
  * sentinel stays inside its documented 0.22-0.38 ms noise band — the
  * mode-separation the new sentinel exists for.
  *
  * Run: sbt 'runMain graft.tools.ShuffleSentinelProbe [nHogs]'
  */
object ShuffleSentinelProbe {
  def main(args: Array[String]): Unit = {
    val nHogs = args.headOption.map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .appName("shuffle-sentinel-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cpuSentinel(): Double = (0 until 3).map { i =>
      if (i > 0) Thread.sleep(30)
      MachineCanary.measure(50)._2
    }.min
    def shuffleFloor(): Double = {
      (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        spark.range(2000000L).select((col("id") % 9973).as("k"), col("id"))
          .repartition(32, col("k")).groupBy(col("k"))
          .agg(sum(col("id"))).count()
        (System.nanoTime() - t0) / 1e6
      }.min
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    shuffleFloor() // codegen warm
    val cpuIdle = median((0 until 5).map(_ => cpuSentinel()))
    val shfIdle = median((0 until 5).map(_ => shuffleFloor()))

    // DRAM antagonist: each hog loops the STREAM triad over its own
    // ~67 MB working set — saturates the memory bus without touching
    // the canary block's cache lines
    @volatile var stop = false
    val hogs = (0 until nHogs).map { _ =>
      val t = new Thread(() => {
        val n = 2800000
        val a = new Array[Double](n)
        val b = Array.tabulate(n)(i => (i % 1024) * 0.5)
        val c = Array.tabulate(n)(i => (i % 512) * 0.25)
        while (!stop) {
          var i = 0
          while (i < n) { a(i) = b(i) + 3.0 * c(i); i += 1 }
        }
        if (a(n / 2).isNaN) throw new IllegalStateException("unreachable")
      })
      t.setDaemon(true)
      t.start()
      t
    }
    Thread.sleep(1000) // let the hogs ramp

    val cpuLoaded = median((0 until 5).map(_ => cpuSentinel()))
    val shfLoaded = median((0 until 5).map(_ => shuffleFloor()))
    stop = true
    hogs.foreach(_.join(2000))

    println(f"cpu_sentinel_ms idle=$cpuIdle%.3f loaded=$cpuLoaded%.3f ratio=${cpuLoaded / cpuIdle}%.2f")
    println(f"shuffle_floor_ms idle=$shfIdle%.0f loaded=$shfLoaded%.0f ratio=${shfLoaded / shfIdle}%.2f")
    println(f"gate_1.5x: cpu_flags=${cpuLoaded / cpuIdle > 1.5} shuffle_flags=${shfLoaded / shfIdle > 1.5}")
    spark.stop()
  }
}
