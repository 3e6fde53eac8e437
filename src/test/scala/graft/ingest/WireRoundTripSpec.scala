package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Event

/** Wire-format round trip: golden reference events (README.md:60-129)
  * parsed through the envelope schema and re-serialized must match the
  * documented JSON — field names, enum values, omitted nulls, and the
  * record payload inlined as a JSON object.
  */
class WireRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(name: String): (String, String) = {
    val src = scala.io.Source.fromResource(s"golden/$name.json")
    val original = try src.mkString.trim finally src.close()
    val parsed = Seq(original).toDF("value")
      .select(from_json(col("value"), Event.wireSchema).as("e"))
      .select("e.*")
    val wire = Decode.toWire(parsed).select("wire").as[String].head()
    (original, wire)
  }

  for (name <- Seq("commit_create_like", "commit_delete_follow",
      "identity_update", "account_active")) {
    test(s"golden $name round-trips byte-compatibly") {
      val (original, wire) = roundTrip(name)
      assert(wire == original)
    }
  }
}
