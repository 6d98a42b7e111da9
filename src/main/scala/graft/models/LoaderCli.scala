package graft.models

import org.apache.spark.sql.SparkSession

/** User-facing loader entry point mirroring the reference CLI's
  * `process_files` command (tpcdi.py:46-77): ingest a DIGen Batch1
  * directory, then either `--show` a sample of each table (the
  * reference's development flow) or persist it as parquet.
  *
  * Usage:
  *   runMain graft.models.LoaderCli <batchDir> [--table NAME] [--show] [--out DIR]
  *                                  [--batch2 DIR]
  *
  *   --table NAME  process one source table (default: all 17)
  *   --show        print a 20-row sample instead of writing
  *   --out DIR     write each table to DIR/NAME (parquet; default /tmp/graft_wh)
  *   --batch2 DIR  incremental refresh: apply the delta batch in DIR to
  *                 the Batch1 warehouse via Warehouse.applyBatch2 and
  *                 show/write the refreshed MODELS instead of the raw
  *                 source tables (the reference's named future work,
  *                 README.md:325)
  *   --batch3 DIR  with --batch2: chain a second delta batch on top of
  *                 the refreshed warehouse (Warehouse.applyBatchDirs —
  *                 the full TPC-DI batch sequence, gate q49)
  */
object LoaderCli {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    require(positional.nonEmpty,
      "usage: LoaderCli <batchDir> [--table NAME] [--show] [--out DIR]")
    val batchDir = positional.head
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val table = opt("--table")
    val show = args.contains("--show")
    val out = opt("--out").getOrElse("/tmp/graft_wh")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = (opt("--batch2"), opt("--batch3")) match {
      case (Some(d2), Some(d3)) =>
        Warehouse.applyBatchDirs(spark, batchDir, Seq(d2, d3))
      case (Some(d2), None) => Warehouse.applyBatch2Dir(spark, batchDir, d2)
      case (None, Some(_)) =>
        sys.error("--batch3 requires --batch2 (batches apply in order)")
      case (None, None) => Loader.loadAll(spark, batchDir)
    }
    val selected = table.fold(tables)(n =>
      tables.filter { case (k, _) => k == n }.ensuring(_.nonEmpty, s"unknown table $n; " +
        s"known: ${tables.keys.toSeq.sorted.mkString(", ")}"))
    selected.toSeq.sortBy(_._1).foreach { case (name, df) =>
      if (show) { println(s"== $name"); df.show(20, truncate = false) }
      else {
        df.write.mode("overwrite").parquet(s"$out/$name")
        println(s"wrote $out/$name")
      }
    }
    spark.stop()
  }
}
