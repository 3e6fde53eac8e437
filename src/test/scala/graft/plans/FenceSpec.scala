package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Decode

/** The optimization fence: plan-shape and semantics guarantees.
  *
  * The decode chain parses each wire frame ONCE — without the fence,
  * predicate pushdown + project collapse substitute the `from_json`
  * alias into every consuming operator (the round-8 mixed_decode plan
  * carried up to 9 copies). The fence pins the parse-once shape; these
  * tests keep it pinned.
  */
class FenceSpec extends SparkSpec {
  import spark.implicits._

  // frames come off a FILE scan: a local relation would let
  // ConvertToLocalRelation fold the parse away and prove nothing
  private lazy val frames = {
    val path = tmpDir("fence-frames")
    (1 to 200).map { i =>
      s"""{"t":"#commit","did":"did:plc:u$i","rev":"r$i","seq":$i,"time":"2024-09-05T07:00:${i % 60}.000Z","tooBig":false,""" +
        s""""ops":[{"action":"create","path":"app.graft.doc/k$i","cid":"c$i","recordCid":"c$i","record":{"v":$i}}]}"""
    }.toDF("value").write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  test("decode physical plan evaluates from_json exactly once") {
    val decoded = Decode.decodeFrames(Decode.parseMixedFrames(frames))
      .filter(col("type") === "com")
      .select("did", "event_time_us")
    val physical = decoded.queryExecution.executedPlan.toString
    val parses = "from_json".r.findAllIn(physical).size
    assert(parses == 1, s"expected ONE from_json in the plan, found $parses:\n$physical")
  }

  test("fence is a pure plan barrier: fenced and unfenced results are identical") {
    val base = frames.select(from_json(col("value"),
      graft.model.Event.rawFrameSchema).as("f"))
    val unfenced = base.select(col("f.*")).filter(col("t") === "#commit")
      .select("did", "seq")
    val fenced = Fence.wrap(base).select(col("f.*")).filter(col("t") === "#commit")
      .select("did", "seq")
    assert(fenced.collect().sortBy(_.getString(0)).toSeq ==
      unfenced.collect().sortBy(_.getString(0)).toSeq)
    // and the fence itself leaves no physical operator behind
    assert(!fenced.queryExecution.executedPlan.toString.contains("Fence"))
  }

  test("fence blocks predicate pushdown across it, passes it inside freely") {
    val fenced = Fence.wrap(frames.select(from_json(col("value"),
      graft.model.Event.rawFrameSchema).as("f")))
      .filter(col("f.t") === "#commit")
    val optimized = fenced.queryExecution.optimizedPlan
    // the filter must sit ABOVE the fence, not inside it next to the parse
    val fenceChild = optimized.collectFirst { case Fence(c) => c }
    assert(fenceChild.isDefined, "fence survives logical optimization")
    assert(!fenceChild.get.toString.contains("#commit"),
      s"predicate leaked below the fence:\n$optimized")
  }
}
