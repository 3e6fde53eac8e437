package graft.serve

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.model.Collections

class ServeJobSpec extends SparkSpec {
  import spark.implicits._

  test("streaming fan-out: one query, per-subscriber filtered sinks (server.go:62-116)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Long, String)]
    val received = TrieMap.empty[String, Long]

    in.addData((1 to 300).map { i =>
      (if (i % 3 == 0) "did:plc:alice" else s"did:plc:u$i",
        i.toLong,
        if (i % 2 == 0) "app.bsky.feed.post" else "app.bsky.feed.like")
    })

    val q = ServeJob.start(
      in.toDF().toDF("did", "time_us", "collection"),
      specs = Map(
        "all"   -> Subscribe.SubscriberSpec(),
        "posts" -> Subscribe.SubscriberSpec(wantedCollections = Seq("app.bsky.feed.post")),
        "alice" -> Subscribe.SubscriberSpec(wantedDids = Seq("did:plc:alice")),
        "late"  -> Subscribe.SubscriberSpec(hwmUs = 250)),
      checkpointDir = tmpDir("serve-ckpt"),
      sink = (name, df) => received.updateWith(name) {
        prev => Some(prev.getOrElse(0L) + df.count())
      })

    q.awaitTermination()

    assert(received("all") == 300)
    assert(received("posts") == 150)
    assert(received("alice") == 100)
    assert(received("late") == 50)
  }

  test("per-collection record view parses golden like record (README.md:60-81)") {
    import org.apache.spark.sql.functions._
    val src = scala.io.Source.fromResource("golden/commit_create_like.json")
    val golden = try src.mkString.trim finally src.close()
    val events = Seq(golden).toDF("value")
      .select(from_json(col("value"), graft.model.Event.wireSchema).as("e"))
      .select("e.*")
    val view = Collections.recordView(events, Collections.Like)
    val rec = view.select("record.*").head()
    assert(rec.getAs[String]("$type") == "app.bsky.feed.like")
    assert(rec.getAs[String]("createdAt") == "2024-09-09T19:46:02.102Z")
    val subject = rec.getStruct(rec.fieldIndex("subject"))
    assert(subject.getAs[String]("uri").startsWith("at://did:plc:wa7b35"))
    // unknown collection rejected explicitly, raw passthrough preserved
    intercept[IllegalArgumentException] {
      Collections.recordView(events, "com.example.unknown")
    }
  }
}
