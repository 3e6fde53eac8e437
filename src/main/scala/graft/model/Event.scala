package graft.model

import org.apache.spark.sql.types._

/** The jetstream event envelope, re-expressed as Spark case classes +
  * StructType (reference: /root/reference/pkg/models/models.go:9-35).
  *
  * Fixed outer schema, schemaless `record` payload: the record stays a
  * raw-JSON string column (reference `json.RawMessage`, models.go:23) and
  * is parsed per-collection with `from_json` at query time — we
  * deliberately do NOT invent a closed schema the reference doesn't have
  * (SURVEY §7.4.4). Spark 's VariantType is the escape hatch if open-schema
  * indexing is ever needed.
  */
final case class CommitPayload(
    rev: String,
    opType: String, // "c" | "u" | "d"  (models.go:32-34; JSON field "operation")
    collection: String,
    rkey: String,
    record: Option[String], // raw JSON; absent on deletes
    cid: Option[String])

final case class AccountPayload(
    active: Option[Boolean],
    did: String,
    seq: Long,
    time: String,
    status: Option[String])

final case class IdentityPayload(
    did: String,
    handle: Option[String],
    seq: Long,
    time: String)

final case class Event(
    did: String,
    time_us: Long,
    eventType: String, // "com" | "acc" | "id"  (models.go:27-31)
    commit: Option[CommitPayload],
    account: Option[AccountPayload],
    identity: Option[IdentityPayload])

object Event {
  // enum constants, models.go:27-35
  val TypeCommit   = "com"
  val TypeAccount  = "acc"
  val TypeIdentity = "id"
  val CommitCreate = "c"
  val CommitUpdate = "u"
  val CommitDelete = "d"

  /** Wire schema matching the reference's JSON (field names per models.go
    * json tags). `record` is declared StringType: Spark's JSON parser
    * re-serializes a nested object to its raw JSON text when the target
    * type is string, which is exactly the reference's `json.RawMessage`
    * passthrough semantics (models.go:23).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("did", StringType),
    StructField("time_us", LongType),
    StructField("type", StringType),
    StructField("commit", StructType(Seq(
      StructField("rev", StringType),
      StructField("type", StringType),
      StructField("collection", StringType),
      StructField("rkey", StringType),
      StructField("record", StringType),
      StructField("cid", StringType)))),
    StructField("account", StructType(Seq(
      StructField("active", BooleanType),
      StructField("did", StringType),
      StructField("seq", LongType),
      StructField("time", StringType),
      StructField("status", StringType)))),
    StructField("identity", StructType(Seq(
      StructField("did", StringType),
      StructField("handle", StringType),
      StructField("seq", LongType),
      StructField("time", StringType))))))

  private val rawOpsType = ArrayType(StructType(Seq(
    StructField("action", StringType), // create | update | delete
    StructField("path", StringType),
    StructField("cid", StringType),      // op-declared cid
    StructField("recordCid", StringType), // cid of the fetched record
    StructField("record", StringType))))

  /** Raw ingest-side frame: one firehose commit message before the op
    * explode (reference: indigo `RepoCommit` as consumed at
    * pkg/consumer/consumer.go:163-215) — did, rev, tooBig flag, and N ops
    * with `path = "<collection>/<rkey>"`.
    */
  val rawCommitSchema: StructType = StructType(Seq(
    StructField("did", StringType),
    StructField("rev", StringType),
    StructField("seq", LongType),
    StructField("time", StringType),
    StructField("tooBig", BooleanType),
    StructField("ops", rawOpsType)))

  /** Mixed-stream raw frame: the flat union of the three firehose frame
    * bodies plus the header discriminator `t` ("#commit" | "#identity" |
    * "#account" — the XRPCStreamEvent switch arms at
    * pkg/consumer/consumer.go:102-155). Shared fields (did/seq/time)
    * appear once; kind-specific fields are null on other kinds.
    */
  val rawFrameSchema: StructType = StructType(Seq(
    StructField("t", StringType),
    StructField("did", StringType),
    StructField("seq", LongType),
    StructField("time", StringType), // RFC3339 (consumer.go:115,138)
    // commit body
    StructField("rev", StringType),
    StructField("tooBig", BooleanType),
    StructField("ops", rawOpsType),
    // identity body (indigo SyncSubscribeRepos_Identity)
    StructField("handle", StringType),
    // account body (indigo SyncSubscribeRepos_Account)
    StructField("active", BooleanType),
    StructField("status", StringType)))
}
