package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.KeyedOrder._

/** Per-key ordered parallelism (parallel.go:92-152): same-key events stay
  * ordered across micro-batches; state carries the per-key hwm.
  */
class KeyedOrderSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState variant matches flatMapGroupsWithState semantics") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[KeyedEvent]
      val q = KeyedOrder.processTws(in.toDS()).writeStream
        .format("memory").queryName("tws_out").outputMode("append").start()
      in.addData(KeyedEvent("a", 3, "a3"), KeyedEvent("a", 1, "a1"), KeyedEvent("b", 5, "b5"))
      q.processAllAvailable()
      in.addData(KeyedEvent("a", 2, "a2"), KeyedEvent("b", 6, "b6"))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("tws_out").as[OrderedEvent].collect()
      assert(out.filter(_.did == "a").sortBy(_.time_us).map(e => (e.time_us, e.inOrder)).toSeq ==
        Seq((1L, true), (2L, false), (3L, true)))
      assert(out.filter(_.did == "b").forall(_.inOrder))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("per-key order maintained across batches; regressions flagged") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = KeyedOrder.process(in.toDS()).writeStream
      .format("memory").queryName("keyed_out").outputMode("append").start()

    in.addData(
      KeyedEvent("a", 3, "a3"), KeyedEvent("a", 1, "a1"),
      KeyedEvent("b", 5, "b5"))
    q.processAllAvailable()
    // batch 2: a/2 regresses below a's hwm=3 → flagged; b/6 advances
    in.addData(KeyedEvent("a", 2, "a2"), KeyedEvent("b", 6, "b6"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("keyed_out").as[OrderedEvent].collect()
    val a = out.filter(_.did == "a").sortBy(_.time_us)
    assert(a.map(e => (e.time_us, e.inOrder)).toSeq ==
      Seq((1L, true), (2L, false), (3L, true)))
    val b = out.filter(_.did == "b").sortBy(_.time_us)
    assert(b.forall(_.inOrder))
  }
}
