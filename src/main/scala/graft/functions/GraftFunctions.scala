package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions.
  *
  * Two entry points:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *     build time (the standard deployment path);
  *   - `GraftFunctions.register(spark)` for an already-running session
  *     (idempotent; used by the test/verify harness).
  *
  * Column-API wrappers are provided so Scala callers don't need SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private[functions] val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("nsid_valid",
      new ExpressionInfo(classOf[NsidValid].getName, "nsid_valid"),
      (args: Seq[Expression]) => NsidValid(args.head)),
    ("did_valid",
      new ExpressionInfo(classOf[DidValid].getName, "did_valid"),
      (args: Seq[Expression]) => DidValid(args.head)),
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    ("vec_norm",
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (args: Seq[Expression]) => VecNorm(args.head)),
    ("count_less",
      new ExpressionInfo(classOf[CountLess].getName, "count_less"),
      (args: Seq[Expression]) => CountLess(args(0), args(1))),
    ("cbor_to_json",
      new ExpressionInfo(classOf[CborToJson].getName, "cbor_to_json"),
      (args: Seq[Expression]) => CborToJson(args.head)),
    ("json_to_cbor",
      new ExpressionInfo(classOf[JsonToCbor].getName, "json_to_cbor"),
      (args: Seq[Expression]) => JsonToCbor(args.head)),
    ("xrpc_frame_to_json",
      new ExpressionInfo(classOf[XrpcFrameToJson].getName, "xrpc_frame_to_json"),
      (args: Seq[Expression]) => XrpcFrameToJson(args.head)),
    ("md5_prefix",
      new ExpressionInfo(classOf[Md5Prefix].getName, "md5_prefix"),
      (args: Seq[Expression]) =>
        Md5Prefix(args(0), args(1).eval().asInstanceOf[Number].intValue)))

  /** Idempotently register all graft functions on a live session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }

  // Column-API wrappers (classic-mode Column↔Expression bridge)
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def nsid_valid(c: Column): Column = column(NsidValid(expression(c)))
  def did_valid(c: Column): Column = column(DidValid(expression(c)))
  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def vec_norm(c: Column): Column = column(VecNorm(expression(c)))
  def count_less(arr: Column, v: Column): Column =
    column(CountLess(expression(arr), expression(v)))
  def cbor_to_json(c: Column): Column = column(CborToJson(expression(c)))
  def json_to_cbor(c: Column): Column = column(JsonToCbor(expression(c)))
  def xrpc_frame_to_json(c: Column): Column = column(XrpcFrameToJson(expression(c)))
  def md5_prefix(c: Column, nibbles: Int): Column =
    column(Md5Prefix(expression(c), nibbles))
}
