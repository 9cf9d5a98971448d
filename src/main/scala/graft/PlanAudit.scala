package graft

import org.apache.spark.sql.SparkSession

/** Plan-smell audit over every registered query: counts the physical
  * operators that decide 100 TB viability. Rows are flagged when they
  * contain a nested-loop/cartesian join or a global (un-partitioned)
  * window — acceptable only where the query documents it.
  * Usage: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
    println(f"${"query"}%-24s ex  bhj smj shj bnl cart win  flags")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      def n(op: String) = op.r.findAllIn(p).size
      val globalWin = "Window .*windowspecdefinition\\((?!.*partition)".r
        .findAllIn(p).size
      val flags = (smells.filter(p.contains(_)) ++
        (if (p.contains("Window [") && p.contains("partitionBy")) Nil else Nil))
        .mkString(",")
      println(f"$name%-24s ${n("Exchange")}%-3d ${n("BroadcastHashJoin")}%-3d " +
        f"${n("SortMergeJoin")}%-3d ${n("ShuffledHashJoin")}%-3d " +
        f"${n("BroadcastNestedLoopJoin")}%-3d ${n("CartesianProduct")}%-4d " +
        f"${n("Window")}%-4d $flags")
    }
    spark.stop()
  }
}
