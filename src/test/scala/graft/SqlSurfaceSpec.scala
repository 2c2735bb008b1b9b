package graft

import org.apache.spark.sql.functions._

/** The engine's SQL surface: registered views + spark.sql give the
  * same answers as the Column DSL (the reference's only query language
  * was SQL text, S5/K3 sites — both entries must agree). */
class SqlSurfaceSpec extends SparkSpecBase {

  test("spark.sql over registered views matches the DSL plan") {
    Tables.registerViews(spark, sf)
    val sqlResult = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val dsl = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
    assertBagEqual(sqlResult, dsl)
  }

  test("engine functions are SQL-callable (the GraftExtensions builders)") {
    // extensions apply at session BUILD time and this suite shares one
    // SparkContext, so drive the same expression builders the
    // extension injects through the live session's function registry
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_human_number",
      exprs => graft.plans.GraftExtensions.parseHumanNumberExpr(exprs.head),
      "scala_udf")
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash64",
      exprs => graft.plans.GraftExtensions.portableHash64Expr(exprs.head),
      "scala_udf")
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "approx_top_terms",
      exprs => graft.plans.SpaceSavingAgg(exprs.head, 5).toAggregateExpression(),
      "scala_udf")
    assert(s2.sql("SELECT parse_human_number('1.2B') AS v").head.getDouble(0)
      == 1.2e9)
    assert(s2.sql("SELECT portable_hash64('hello') AS v").head.getLong(0)
      == 419982666956583591L)
    // and the Catalyst tree agrees with the Column-API original
    import spark.implicits._
    val roundTrip = Seq("1.2B", "5K", "junk", "7").toDF("x")
      .select(graft.functions.Scalars.parseHumanNumber(col("x")).as("a"))
      .collect().map(r => Option(r.get(0)))
    val viaSql = s2.sql(
      """SELECT parse_human_number(x) FROM VALUES
        |('1.2B'), ('5K'), ('junk'), ('7') AS v(x)""".stripMargin)
      .collect().map(r => Option(r.get(0)))
    assert(roundTrip.toList == viaSql.toList)
    val top = s2.sql(
      """SELECT approx_top_terms(t, 5) AS top FROM VALUES
        |('a'), ('a'), ('b') AS v(t)""".stripMargin)
      .selectExpr("top[0].term", "top[0].count_est").head
    assert(top.getString(0) == "a" && top.getLong(1) == 2L)
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_meta",
      exprs => graft.plans.ImageMeta(exprs.head),
      "scala_udf")
    val img = s2.sql(
      """SELECT image_meta(unhex(concat(
        |  '89504E470D0A1A0A0000000D49484452',
        |  '00000280', '000001E0', '0806000000'))) AS m""".stripMargin)
      .selectExpr("m.format", "m.width", "m.height").head
    assert(img.getString(0) == "png" && img.getInt(1) == 640 &&
      img.getInt(2) == 480)
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "video_meta",
      exprs => graft.plans.VideoMeta(exprs.head),
      "scala_udf")
    // minimal mp4: ftyp + moov(mvhd v0 ts=600 dur=3000) — same bytes
    // as VideoHeaderSpec's canonical container, sans tracks
    val vid = s2.sql(
      """SELECT video_meta(unhex(concat(
        |  '0000001466747970', '69736f6d', '0000020069736f6d',
        |  '000000746d6f6f76',
        |  '0000006c6d766864', '00000000', '0000000000000000',
        |  '00000258', '00000bb8',
        |  '000100000100', repeat('00', 10),
        |  '00010000', repeat('00000000', 3), '00010000',
        |  repeat('00000000', 3), '40000000',
        |  repeat('00', 24), '00000003'))) AS m""".stripMargin)
      .selectExpr("m.format", "m.brand", "m.timescale", "m.duration",
        "m.n_tracks").head
    assert(vid.getString(0) == "mp4" && vid.getString(1) == "isom" &&
      vid.getInt(2) == 600 && vid.getLong(3) == 3000L &&
      vid.getInt(4) == 0)
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60",
      exprs => graft.plans.GraftExtensions.simHash60Expr(exprs.head),
      "scala_udf")
    // the SQL surface must agree with the operator's Column path
    val sqlSig = s2.sql("SELECT simhash60('the quick brown fox') AS v")
      .head.getLong(0)
    val colSig = Seq((1L, "the quick brown fox")).toDF("k", "text")
      .select(graft.plans.SimHash60(col("text"))).head.getLong(0)
    assert(sqlSig == colSig && sqlSig != 0L)
    // the injected builder casts, so a non-string argument hashes by
    // its string form instead of failing analysis
    val intSig = s2.sql("SELECT simhash60(12345) AS v").head.getLong(0)
    val intCol = Seq("12345").toDF("t")
      .select(graft.plans.SimHash60(col("t"))).head.getLong(0)
    assert(intSig == intCol && intSig != 0L)
    // the markup/URL ladders register through the SAME expression
    // builders the Column API wraps — assert the trees agree end to end
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_markup",
      exprs => graft.functions.TextFunctions.stripMarkupExpr(exprs.head),
      "scala_udf")
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonicalize_url",
      exprs => graft.functions.TextFunctions.canonicalizeUrlExpr(exprs.head),
      "scala_udf")
    val html = "<p>a</p><script>var x = 1 < 2;</script>&amp; b"
    val viaSqlStrip = s2.sql(
      s"SELECT strip_markup('${html.replace("'", "''")}') AS v")
      .head.getString(0)
    val viaColStrip = Seq(html).toDF("t")
      .select(graft.functions.TextFunctions.stripMarkup(col("t")))
      .head.getString(0)
    assert(viaSqlStrip == viaColStrip && viaSqlStrip == "a & b")
    val u = "HTTPS://WWW.EXAMPLE.COM:443/p/1?utm_a=1&b=2#f"
    val viaSqlUrl = s2.sql(s"SELECT canonicalize_url('$u') AS v")
      .head.getString(0)
    val viaColUrl = Seq(u).toDF("t")
      .select(graft.functions.TextFunctions.canonicalizeUrl(col("t")))
      .head.getString(0)
    assert(viaSqlUrl == viaColUrl &&
      viaSqlUrl == "https://example.com/p/1?b=2")
    // extract_urls registers through the same builder the Column API
    // shares its pattern constant with
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_urls",
      exprs => graft.functions.TextFunctions.extractUrlsExpr(exprs.head),
      "scala_udf")
    val pageTxt = """a <a href="https://g.com/1">l</a> b HTTP://H.ORG/2 c"""
    val viaSqlUrls = s2.sql(
      s"SELECT extract_urls('${pageTxt.replace("'", "''")}') AS v")
      .head.getSeq[String](0)
    val viaColUrls = Seq(pageTxt).toDF("t")
      .select(graft.functions.TextFunctions.extractUrls(col("t")))
      .head.getSeq[String](0)
    assert(viaSqlUrls == viaColUrls &&
      viaSqlUrls == Seq("https://g.com/1", "HTTP://H.ORG/2"))
  }

  test("events view exposes micro-truncated timestamps") {
    Tables.registerViews(spark, sf)
    val n = spark.sql(
      "SELECT COUNT(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .head.getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("conf-gated COUNT(DISTINCT) → HLL++ optimizer rewrite") {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(graft.plans.ApproxDistinctRewrite)
    val o = s2.read.parquet(s"$sf/orders.parquet")
    def q = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d"))
    val exact = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // default OFF: plan and answer stay exact
    assert(!q.queryExecution.optimizedPlan.toString
      .contains("approx_count_distinct"))
    s2.conf.set("spark.graft.approxDistinct.enabled", "true")
    try {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"rewrite did not fire:\n$plan")
      val approx = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet)
      for ((k, e) <- exact) {
        val a = approx(k).toDouble
        assert(math.abs(a - e) <= math.max(3.0, 0.1 * e),
          s"$k: approx $a too far from exact $e")
      }
      // multi-column distinct is deliberately untouched
      val multi = o.agg(countDistinct(col("o_custkey"),
        col("o_orderpriority")))
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
    } finally s2.conf.unset("spark.graft.approxDistinct.enabled")
  }
}
