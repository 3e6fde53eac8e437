package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed MinHash aggregator matches the DataFrame min-column path") {
    // same permutation family as Dedup.minhashLshPairs
    val hashes = Seq(
      (1L, 100L), (1L, 2000L), (1L, 37L),
      (2L, 999999L), (2L, 5L))
    val expected = hashes.groupBy(_._1).map { case (doc, hs) =>
      doc -> (0 until 16).map { j =>
        hs.map { case (_, h) => ((2L * j + 1) * h + 7919L * j + 1) % 2147483647L }.min
      }
    }

    // SQL/DataFrame path via udaf registration
    spark.udf.register("minhash_sig", udaf(new MinHashAgg(16)))
    val viaUdaf = hashes.toDF("doc_id", "h")
      .repartition(4) // force partial + merge path
      .groupBy("doc_id").agg(expr("minhash_sig(h)").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaUdaf.view.mapValues(_.toSeq).toMap ==
      expected.view.mapValues(_.toSeq).toMap)

    // typed Dataset path
    val viaTyped = hashes.toDF("doc_id", "h").as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new MinHashAgg(16).toColumn)
      .collect().toMap
    assert(viaTyped.view.mapValues(_.toSeq).toMap ==
      expected.view.mapValues(_.toSeq).toMap)
  }
}
