package graft
/** Dev tool: run named queries against a sf dir (args: sfDir name...) and
  * print the full result — the local loop for checking oracle rows. */
object Show {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.local(cores = "8", app = "graft-show")
    for (name <- args.tail) {
      println(s"===== $name @ $sfDir =====")
      val t0 = System.nanoTime()
      Queries.byName(name).run(spark, sfDir).show(200, truncate = false)
      println(f"  [${(System.nanoTime() - t0) / 1e9}%.2f s]")
      graft.operators.Ckpt.release(spark) // same lifecycle as Verify/Bench
    }
    spark.stop()
  }
}
