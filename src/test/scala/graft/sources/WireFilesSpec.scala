package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Decode
import graft.model.Event
import graft.store.EventsTable

/** Wire JSONL export/import: hour-partitioned layout, canonical
  * round trip, and golden-fixture compatibility.
  */
class WireFilesSpec extends SparkSpec {
  import spark.implicits._

  private def mixedEvents = Decode.decodeFrames(Decode.parseMixedFrames(Seq(
    """{"t":"#commit","did":"did:plc:alice","rev":"r1","seq":1,"time":"2024-09-05T06:11:04.870Z","tooBig":false,"ops":[{"action":"create","path":"app.bsky.feed.post/k1","cid":"c1","recordCid":"c1","record":{"text":"hi"}}]}""",
    """{"t":"#identity","did":"did:plc:dan","seq":4,"time":"2024-09-05T07:30:00.000Z","handle":"dan.example.com"}""",
    """{"t":"#account","did":"did:plc:erin","seq":5,"time":"2024-09-05T08:45:00.000Z","active":true}""").toDF("value")))
    .withColumn("time_us", col("event_time_us"))
    .select("did", "time_us", "type", "commit", "account", "identity") // wire field order

  test("write partitions by hour; read returns the same envelopes; round trip is canonical") {
    val path = tmpDir("wire-files")
    WireFiles.write(mixedEvents, path)

    // three distinct hours → three partition dirs
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith(EventsTable.PartitionCol)).sorted
    assert(dirs.length == 3)

    val back = WireFiles.read(spark, path)
    assert(back.count() == 3)
    assert(back.select("type").as[String].collect().toSet == Set("com", "id", "acc"))
    val idRow = back.filter(col("type") === "id").head()
    assert(idRow.getStruct(idRow.fieldIndex("identity")).getAs[String]("handle")
      == "dan.example.com")

    // canonical: re-exporting the imported rows yields byte-identical lines
    val wires1 = spark.read.textFile(path).collect().sorted.toSeq
    val path2 = tmpDir("wire-files-2")
    WireFiles.write(back, path2)
    val wires2 = spark.read.textFile(path2).collect().sorted.toSeq
    assert(wires2 == wires1)
  }

  test("golden wire fixtures parse through the import path") {
    val src = scala.io.Source.fromResource("golden/identity_update.json")
    val golden = try src.mkString.trim finally src.close()
    val path = tmpDir("wire-golden")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "events.jsonl"), golden.getBytes("UTF-8"))
    val back = WireFiles.read(spark, path)
    val row = back.head()
    assert(row.getAs[String]("type") == Event.TypeIdentity)
    assert(row.getAs[Long]("time_us") == 1725516665234703L)
  }
}
