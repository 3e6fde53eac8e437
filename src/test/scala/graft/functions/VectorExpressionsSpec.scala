package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native vector expression semantics: parity with the HOF composition
  * they replaced (float widening, null propagation, length mismatch),
  * plus codegen/interpreted agreement — the generated loop and
  * `nullSafeEval` must compute the identical double.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import GraftFunctions.{vec_dot, vec_norm}

  test("vec_dot/vec_norm on float arrays match the widened-double fold") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.1f, 0.2f, 0.3f), Array(-1.0f, 0.0f, 1.0f)),
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), vec_dot(col("a"), col("b")).as("d"),
      vec_norm(col("a")).as("n")).as[(Long, Double, Double)].collect().sortBy(_._1)
    // reference: widen each float to double, then fold — the old
    // aggregate(zip_with(transform(cast))) semantics
    def dotRef(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def normRef(a: Array[Float]) =
      math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(out(0)._2 == dotRef(Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
    assert(out(0)._3 == normRef(Array(1.0f, 2.0f, 3.0f)))
    assert(out(1)._2 == dotRef(Array(0.1f, 0.2f, 0.3f), Array(-1.0f, 0.0f, 1.0f)))
  }

  test("mixed float/double arguments widen per side") {
    val df = Seq((1L, Array(2.0f, 3.0f))).toDF("id", "v")
    val q = array(lit(10.0d), lit(0.5d))
    val d = df.select(vec_dot(col("v"), q)).as[Double].head()
    assert(d == 2.0 * 10.0 + 3.0 * 0.5)
  }

  test("null array, null element, and length mismatch all yield null") {
    val withNullElem = Seq((1L, Array[java.lang.Float](1.0f, null, 3.0f)))
      .toDF("id", "v")
    assert(withNullElem.select(vec_norm(col("v"))).head().isNullAt(0))
    val mismatch = Seq((1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "a", "b")
    assert(mismatch.select(vec_dot(col("a"), col("b"))).head().isNullAt(0))
    val nullArr = Seq((1L, Option.empty[Array[Float]])).toDF("id", "v")
    assert(nullArr.select(vec_norm(col("v"))).head().isNullAt(0))
  }

  test("count_less counts boundaries below v; null array/element -> null") {
    import GraftFunctions.count_less
    val df = Seq((1L, Array(0.25, 0.5, 0.75), 0.6),
      (2L, Array(0.25, 0.5, 0.75), 0.1),
      (3L, Array(0.25, 0.5, 0.75), 0.5), // strict: boundary == v not counted
      (4L, Array(0.25, 0.5, 0.75), 2.0)).toDF("id", "b", "v")
    val out = df.select(col("id"), count_less(col("b"), col("v")))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2, 2L -> 0, 3L -> 1, 4L -> 3))
    val nullArr = Seq((1L, Option.empty[Array[Double]], 0.5)).toDF("id", "b", "v")
    assert(nullArr.select(count_less(col("b"), col("v"))).head().isNullAt(0))
    val nullElem = Seq((1L, Array[java.lang.Double](0.25, null), 0.5)).toDF("id", "b", "v")
    assert(nullElem.select(count_less(col("b"), col("v"))).head().isNullAt(0))
    // interpreted path agrees (the codegen/interpreted parity contract)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.select(count_less(col("b"), col("v"))).as[Int].collect().toSeq ==
      Seq(2, 0, 1, 3))
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(64)(j => (math.sin(i * 64 + j) * 100).toFloat)))
      .toDF("id", "v")
    val q = array(Seq.tabulate(64)(j => lit(math.cos(j))): _*)
    def run(codegen: String): Array[(Long, Double, Double)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(col("id"), vec_dot(col("v"), q).as("d"), vec_norm(col("v")).as("n"))
        .as[(Long, Double, Double)].collect().sortBy(_._1)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY").toSeq == run("NO_CODEGEN").toSeq)
  }

  test("sq8_adc: native loop ≡ the unrolled literal fold, codegen ≡ interpreted") {
    import org.apache.spark.sql.graft.Bridge.{column => ecol, expression => eexpr}
    val dim = 64
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 31 + j * 7) % 256).toLong)))
      .toDF("id", "codes")
    val q = Array.tabulate(dim)(_ => rnd.nextDouble() * 2 - 1)
    val mn = Array.tabulate(dim)(_ => rnd.nextDouble() - 0.5)
    val st = Array.tabulate(dim)(_ => rnd.nextDouble() / 255.0)
    // the unrolled literal fold the probe used before the native expr —
    // the IEEE reference the expression must match bit-for-bit
    val fold = (0 until dim).foldLeft(lit(0.0)) { (acc, d) =>
      acc + lit(q(d)) * (lit(mn(d)) +
        element_at(col("codes"), d + 1).cast("double") * lit(st(d)))
    }
    val native = ecol(Sq8Adc(eexpr(col("codes")), q, mn, st))
    def run(codegen: String): Seq[(Long, Double, Double)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(col("id"), native.as("a"), fold.as("b"))
        .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    assert(cg == run("NO_CODEGEN"))
    cg.foreach { case (id, a, b) => assert(a == b, s"row $id: native $a != fold $b") }
    // length mismatch → null (a 32-dim code row against 64-dim params)
    val short = Seq((1L, Array.tabulate(32)(_.toLong))).toDF("id", "codes")
    assert(short.select(ecol(Sq8Adc(eexpr(col("codes")), q, mn, st))).head().isNullAt(0))
    // params compare structurally: two probes binding equal-content
    // params (distinct backing arrays) must canonicalize equal, or
    // Catalyst CSE / exchange reuse silently dies
    // (shared child: Spark 4 column nodes embed a stack-trace Origin,
    // so two col("codes") never compare equal — the params are what
    // this pin is about)
    val sharedChild = eexpr(col("codes"))
    val a = Sq8Adc(sharedChild, q.clone(), mn.clone(), st.clone())
    val b = Sq8Adc(sharedChild, q.clone(), mn.clone(), st.clone())
    assert(a == b && a.hashCode == b.hashCode && a.semanticEquals(b))
  }

  test("sq8 binary packing: pack→adc_bytes ≡ array adc; vec twin ≡ literal twin; codegen ≡ interpreted") {
    import org.apache.spark.sql.graft.Bridge.{column => ecol, expression => eexpr}
    val dim = 48
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(40)(i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 17 + j * 13) % 256).toLong),
        Array.tabulate(dim)(j => math.sin(i + j))))
      .toDF("id", "codes", "qe")
    val q = Array.tabulate(dim)(_ => rnd.nextDouble() * 2 - 1)
    val mn = Array.tabulate(dim)(_ => rnd.nextDouble() - 0.5)
    val st = Array.tabulate(dim)(_ => rnd.nextDouble() / 255.0)
    val packed = ecol(Sq8Pack(eexpr(col("codes"))))
    // packed bytes round-trip unsigned: 255 stays 255
    val arr = ecol(Sq8Adc(eexpr(col("codes")), q, mn, st))
    val bytes = ecol(Sq8AdcBytes(eexpr(packed), q, mn, st))
    // per-row query twin: Sq8AdcVec over the row's own qe column must
    // equal Sq8AdcBytes when that qe is bound as the literal
    def run(codegen: String): Seq[(Long, Double, Double, Double)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(col("id"), arr.as("a"), bytes.as("b"),
          ecol(Sq8AdcVec(eexpr(packed), eexpr(col("qe")), mn, st)).as("v"))
        .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    assert(cg == run("NO_CODEGEN"))
    cg.foreach { case (id, a, b, _) =>
      assert(a == b, s"row $id: packed adc $b != array adc $a") }
    // the vec twin against the per-row qe equals a per-row literal bind
    val rows = df.select(col("id"), col("codes"), col("qe"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Long](1).toArray, r.getSeq[Double](2).toArray))
    val vGot = cg.map(r => r._1 -> r._4).toMap
    rows.foreach { case (id, codes, qe) =>
      val expect = {
        var s = 0.0; var d = 0
        while (d < dim) { s += qe(d) * (mn(d) + codes(d).toDouble * st(d)); d += 1 }
        s
      }
      assert(vGot(id) == expect, s"row $id: vec twin ${vGot(id)} != $expect")
    }
    // length mismatch → null on both binary forms
    val short = Seq((1L, Array.tabulate(8)(_.toLong), Array.tabulate(8)(_.toDouble)))
      .toDF("id", "codes", "qe")
    val shortPacked = ecol(Sq8Pack(eexpr(col("codes"))))
    assert(short.select(ecol(Sq8AdcBytes(eexpr(shortPacked), q, mn, st))).head().isNullAt(0))
    assert(short.select(ecol(Sq8AdcVec(eexpr(shortPacked), eexpr(col("qe")), mn, st))).head().isNullAt(0))
  }

  test("registered for SQL: vec_dot/vec_norm resolve by name") {
    GraftFunctions.register(spark)
    Seq((1L, Array(3.0f, 4.0f))).toDF("id", "v").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_dot(v, v) AS d, vec_norm(v) AS n FROM vecs")
      .as[(Double, Double)].head()
    assert(r == ((25.0, 5.0)))
  }
}
