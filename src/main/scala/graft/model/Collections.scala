package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-collection record schemas (SURVEY §1.3): the engine keeps the
  * `record` payload schemaless (raw JSON StringType), and each consumer
  * parses the collections it cares about with `from_json` — this module
  * ships the well-known Bluesky collection schemas observed in the
  * reference's documented examples (README.md:60-81) and lexicon names.
  *
  * `recordView(df, collection)` = filter to the collection + typed
  * `record` struct column. Unknown collections stay raw — exactly the
  * reference's opaque-passthrough contract (models.go:23), so schema
  * evolution in one collection never breaks the log or other consumers.
  */
object Collections {

  val Like = "app.bsky.feed.like"
  val Post = "app.bsky.feed.post"
  val Follow = "app.bsky.graph.follow"

  private val subjectRef = StructType(Seq(
    StructField("cid", StringType),
    StructField("uri", StringType)))

  /** app.bsky.feed.like (reference README.md:69-77). */
  val likeSchema: StructType = StructType(Seq(
    StructField("$type", StringType),
    StructField("createdAt", StringType),
    StructField("subject", subjectRef)))

  /** app.bsky.feed.post (lexicon app.bsky.feed.post; open fields kept). */
  val postSchema: StructType = StructType(Seq(
    StructField("$type", StringType),
    StructField("createdAt", StringType),
    StructField("text", StringType),
    StructField("langs", ArrayType(StringType)),
    StructField("reply", StructType(Seq(
      StructField("parent", subjectRef),
      StructField("root", subjectRef))))))

  /** app.bsky.graph.follow. */
  val followSchema: StructType = StructType(Seq(
    StructField("$type", StringType),
    StructField("createdAt", StringType),
    StructField("subject", StringType)))

  val schemas: Map[String, StructType] = Map(
    Like -> likeSchema, Post -> postSchema, Follow -> followSchema)

  /** Typed view of one collection: events filtered to `collection` with
    * the raw `commit.record` JSON parsed into a `record` struct.
    */
  def recordView(events: DataFrame, collection: String): DataFrame = {
    val schema = schemas.getOrElse(collection,
      throw new IllegalArgumentException(s"no registered schema for $collection"))
    events
      .filter(col("commit.collection") === collection)
      .withColumn("record", from_json(col("commit.record"), schema))
  }
}
