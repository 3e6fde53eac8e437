package graft.store

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-layout scale mechanics: small-file compaction of closed
  * hour partitions and bucketed co-located joins.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L

  test("compaction collapses micro-batch appends into sorted files; rows identical") {
    val path = tmpDir("compact-table")
    // 8 micro-batch appends into hour 0, one into hour 1 (the open hour)
    (0 until 8).foreach { b =>
      EventsTable.append(
        (0 until 50).map(i => ((b * 50 + i) * 1000L, s"did$i", "c"))
          .toDF("time_us", "did", "collection"),
        path)
    }
    EventsTable.append(Seq((HourUs + 1, "didx", "c")).toDF("time_us", "did", "collection"), path)

    val before = EventsTable.read(spark, path)
      .select("time_us").as[Long].collect().sorted.toSeq
    // each append emits one file per batch partition: ≥ 8 small files
    val nSmall = Compaction.partitionFiles(spark, path, 0).size
    assert(nSmall >= 8)

    val (nBefore, nAfter) = Compaction.compactHour(spark, path, 0)
    assert(nBefore == nSmall && nAfter == 1)

    val after = EventsTable.read(spark, path)
      .select("time_us").as[Long].collect().sorted.toSeq
    assert(after == before, "compaction must not change the data")
    // the partition column survives the rewrite (directory layout intact)
    assert(EventsTable.read(spark, path)
      .filter(col(EventsTable.PartitionCol) === 0).count() == 400)
    // the rewritten file is time-sorted (row order within the single file)
    val inFile = spark.read
      .parquet(s"$path/${EventsTable.PartitionCol}=0")
      .select("time_us").as[Long].collect().toSeq
    assert(inFile == inFile.sorted)
  }

  test("compactClosed stops at the high-water hour") {
    val path = tmpDir("compact-hwm")
    (0 until 3).foreach { _ =>
      EventsTable.append(
        Seq((1000L, "a", "c"), (HourUs + 5, "b", "c")).toDF("time_us", "did", "collection"),
        path)
    }
    val done = Compaction.compactClosed(spark, path, hwmHour = 1)
    assert(done.keySet == Set(0L)) // hour 1 is open: untouched
    assert(Compaction.partitionFiles(spark, path, 0).size == 1)
    assert(Compaction.partitionFiles(spark, path, 1).size == 3)
  }

  test("repair recovers a compaction crash between the renames — no reader-visible loss") {
    import org.apache.hadoop.fs.Path
    def mkTable(tag: String): (String, Seq[Long]) = {
      val path = tmpDir(s"compact-crash-$tag")
      (0 until 4).foreach { b =>
        EventsTable.append(
          (0 until 25).map(i => ((b * 25 + i) * 1000L, s"did$i", "c"))
            .toDF("time_us", "did", "collection"), path)
      }
      (path, EventsTable.read(spark, path).select("time_us").as[Long].collect().sorted.toSeq)
    }
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirOf(path: String) = new Path(s"$path/${EventsTable.PartitionCol}=0")

    // --- crash AFTER dir→backup with a COMPLETE tmp (manifest present):
    // repair rolls FORWARD to the compacted rewrite
    val (p1, rows1) = mkTable("fwd")
    spark.read.parquet(dirOf(p1).toString)
      .repartitionByRange(1, col("time_us")).sortWithinPartitions(col("time_us"))
      .write.parquet(s"$p1/_compact_tmp_0")
    assert(fs.rename(dirOf(p1), new Path(s"$p1/_compact_old_0")))
    assert(!fs.exists(dirOf(p1)), "simulated crash: hour invisible")
    assert(Compaction.repair(spark, p1) == Seq(0L))
    assert(EventsTable.read(spark, p1).select("time_us").as[Long].collect().sorted.toSeq
      == rows1, "rolled forward: same rows, compacted")
    assert(Compaction.partitionFiles(spark, p1, 0).size == 1)
    assert(!fs.exists(new Path(s"$p1/_compact_old_0")) && !fs.exists(new Path(s"$p1/_compact_tmp_0")))

    // --- crash with an INCOMPLETE tmp (no _SUCCESS manifest): repair
    // rolls BACK to the backup — the aborted rewrite is never installed
    val (p2, rows2) = mkTable("bak")
    spark.read.parquet(dirOf(p2).toString).write.parquet(s"$p2/_compact_tmp_0")
    fs.delete(new Path(s"$p2/_compact_tmp_0/_SUCCESS"), false)
    assert(fs.rename(dirOf(p2), new Path(s"$p2/_compact_old_0")))
    assert(Compaction.repair(spark, p2) == Seq(0L))
    assert(EventsTable.read(spark, p2).select("time_us").as[Long].collect().sorted.toSeq
      == rows2, "rolled back: original files intact")
    assert(!fs.exists(new Path(s"$p2/_compact_tmp_0")))

    // --- leftovers while the hour is intact are just swept
    val (p3, rows3) = mkTable("sweep")
    spark.read.parquet(dirOf(p3).toString).write.parquet(s"$p3/_compact_tmp_0")
    assert(Compaction.repair(spark, p3) == Seq.empty)
    assert(!fs.exists(new Path(s"$p3/_compact_tmp_0")), "stray tmp swept")
    // compactClosed self-heals first, then compacts normally
    assert(Compaction.compactClosed(spark, p3, hwmHour = 1).keySet == Set(0L))
    assert(EventsTable.read(spark, p3).select("time_us").as[Long].collect().sorted.toSeq
      == rows3)
  }

  test("bucketed_join registered query: join AND aggregate are exchange-free") {
    val q = graft.query.RelationalQueries.bucketedJoin(spark, "/root/testdata/sf0.001")
    q.collect() // execute so AQE (if any) finalizes
    val plan = q.queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"co-located join + same-key aggregate must have ZERO Exchange, got:\n$plan")
    assert(plan.toString.contains("SortMergeJoin"), "merge hint must pin SMJ")
    // identical answer to the plain (shuffled) join composition
    val plain = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .join(graft.Tables.customer(spark, "/root/testdata/sf0.001"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey")).count()
    assert(q.count() == plain.count())
  }

  test("bucketed tables join with no shuffle on either side") {
    val facts = (1 to 10000).map(i => (i.toLong % 500, i.toLong, i * 1.5))
      .toDF("key", "row_id", "v")
    val dim = (0 to 499).map(i => (i.toLong, s"name$i")).toDF("key", "name")
    try {
      Bucketing.writeBucketed(facts, "t_facts_bkt", "key", 4)
      Bucketing.writeBucketed(dim, "t_dim_bkt", "key", 4)
      val joined = Bucketing.bucketedJoin(spark, "t_facts_bkt", "t_dim_bkt", "key")
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"bucketed join must be shuffle-free, got:\n$plan")
      assert(joined.count() == 10000)
      // same answer as the plain (shuffled) join
      assert(joined.agg(sum(col("v"))).head().getDouble(0) ==
        facts.join(dim, "key").agg(sum(col("v"))).head().getDouble(0))
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_facts_bkt")
      spark.sql("DROP TABLE IF EXISTS t_dim_bkt")
    }
  }
}
