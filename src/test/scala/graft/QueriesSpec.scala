package graft

import org.apache.spark.sql.functions._

/** Smoke + contract tests over the whole query registry. */
class QueriesSpec extends SparkSpecBase {

  test("registry names are unique and oracle keys are a subset") {
    assert(Queries.all.map(_.name).distinct.size == Queries.all.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle coverage never regresses") {
    // 67/75 as of round 2; every no-oracle query must be one of the
    // documented hash-/seed-/sketch-dependent exceptions — a new query
    // without an oracle needs a reason of that kind, not an omission
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set("q19_approx_distinct", "q32_minhash_lsh",
      "q33_simhash", "q36_cosine_lsh_topk", "q52_ivf_topk",
      "q66_mllib_minhash", "q67_mllib_brp_topk", "q73_heavy_hitters")
    assert(noOracle.subsetOf(documented),
      s"undocumented oracle-less queries: ${noOracle -- documented}")
    assert(SparkEntry.oracleSql.size >= 67)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- Queries.all) {
    test(s"${q.name} executes on sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q93's markup-strip flag is an identity on this clean corpus") {
    val off = Queries.byName("q93_llm_pipeline").run(spark, sf)
    spark.conf.set("spark.graft.q93.stripMarkup", "true")
    try {
      val on = Queries.byName("q93_llm_pipeline").run(spark, sf)
      assertBagEqual(off, on)
    } finally spark.conf.unset("spark.graft.q93.stripMarkup")
  }

  test("q01 aggregates reconcile with raw scan") {
    val r = Queries.byName("q01_pricing_summary").run(spark, sf)
    val total = r.agg(sum(col("count_order"))).head.getLong(0)
    val raw = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .count()
    assert(total == raw)
  }

  test("approx_percentile sketch lands within 5% rank error of exact q70") {
    val exact = Queries.byName("q70_percentiles").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap // p50
    val approx = Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"))
      .agg(approx_percentile(col("c_acctbal"), lit(0.5), lit(1000)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // compare by value range: the sketch guarantees rank error, so the
    // value must sit between exact p45 and p55
    val bounds = Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"))
      .agg(percentile(col("c_acctbal"), lit(0.45)).as("lo"),
        percentile(col("c_acctbal"), lit(0.55)).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.keys.foreach { seg =>
      val (lo, hi) = bounds(seg)
      assert(approx(seg) >= lo && approx(seg) <= hi,
        s"$seg: approx ${approx(seg)} outside exact p45..p55 [$lo, $hi]")
    }
  }

  test("q19 approx distinct within 5% of exact") {
    // the registered query exposes the tolerance CONTRACT (exact count
    // + within-3·rsd flag — what the oracle hash-verifies); the flag
    // must hold, and the raw estimate — recomputed here since the
    // query intentionally omits it — meets the tighter 5% bar
    Queries.byName("q19_approx_distinct").run(spark, sf).collect().foreach {
      r => assert(r.getBoolean(2), s"${r.getString(0)}: within_bound false")
    }
    Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect().foreach { r =>
        val a = r.getLong(1); val e = r.getLong(2)
        assert(math.abs(a - e).toDouble / e <= 0.05,
          s"approx $a vs exact $e")
      }
  }

  test("q08 top-k is ordered and bounded") {
    val rows = Queries.byName("q08_top_orders").run(spark, sf).collect()
    assert(rows.length == 25)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q183 PSI: seeded drift registers as positive total index with " +
    "finite per-bucket terms") {
    val rows = Queries.byName("q183_length_psi").run(spark, sf).collect()
    assert(rows.length === 5)
    val terms = rows.map(_.getAs[Double]("psi_term"))
    assert(terms.forall(t => !t.isNaN && !t.isInfinite))
    // PSI ≥ 0 always (each term (p−q)ln(p/q) ≥ 0); drift is seeded,
    // so the total must be STRICTLY positive
    assert(terms.forall(_ >= 0.0), s"negative PSI term in ${terms.toSeq}")
    assert(terms.sum > 0.001, s"seeded drift not detected: ${terms.sum}")
  }

  test("q184 Zipf fit: slope non-positive, r2 in [0, 1], and the " +
    "uniform fixture reads as non-Zipfian") {
    val r = Queries.byName("q184_zipf_fit").run(spark, sf).head()
    val (slope, r2) = (r.getAs[Double]("slope"), r.getAs[Double]("r2"))
    assert(slope <= 0.0, s"count cannot increase with rank: $slope")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    // a natural corpus fits s ≈ -1 tightly; this fixture is uniform
    // by construction — the diagnostic must say so
    assert(slope > -0.6, s"uniform fixture scored Zipf-steep: $slope")
  }

  test("q187 fertility: every word yields at least one subword and " +
    "the ratios tie out against the counts") {
    val rows = Queries.byName("q187_tokenizer_fertility").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nChars, nTok) =
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_bpe_tokens"))
      val (comp, fert) = (r.getAs[Double]("compression"),
        r.getAs[Double]("fertility"))
      assert(nTok >= nWords, "a word segmented to zero subwords")
      assert(nTok <= nChars, "more subwords than characters")
      assert(math.abs(fert - nTok.toDouble / nWords) < 1e-12)
      assert(math.abs(comp - nChars.toDouble / nTok) < 1e-12)
      assert(fert >= 1.0)
    }
  }

  test("q188 buckets partition the scored corpus and their score " +
    "ranges are disjoint and ordered head <= middle <= tail") {
    val rows = Queries.byName("q188_perplexity_buckets").run(spark, sf)
      .collect().map(r => r.getAs[String]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("min_xent"),
          r.getAs[Double]("max_xent")))).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    // every scoreable doc (>= 2 tokens) lands in exactly one bucket
    val scored = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")) >= 2)
      .count()
    assert(rows.values.map(_._1).sum === scored)
    assert(rows("head")._3 <= rows("middle")._2,
      "head max crosses middle min")
    assert(rows("middle")._3 <= rows("tail")._2,
      "middle max crosses tail min")
  }

  test("q191 RRF: the fused score ties out from the two rank columns " +
    "and every row appears in at least one tier") {
    val rows = Queries.byName("q191_rrf_fusion").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cosR = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val hamR = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(cosR.isDefined || hamR.isDefined,
        "a fused row appears in neither tier")
      val expected = BigDecimal(
        cosR.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          hamR.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - expected) < 1e-9,
        s"rrf mismatch: ${r.mkString(",")}")
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getLong(5)).sorted.toSeq == (1L to g.length),
        "fused ranks are not 1..k")
    }
  }

  test("q189 script mix: seeded scripts surface, clean docs stay " +
    "latin-dominant and unmixed") {
    val rows = Queries.byName("q189_script_mix").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (cyr, cjk, ara) = (r.getAs[Long]("n_cyrillic"),
        r.getAs[Long]("n_cjk"), r.getAs[Long]("n_arabic"))
      val (dom, mixed) = (r.getAs[String]("dominant"),
        r.getAs[Boolean]("mixed"))
      id % 4 match {
        case 1 => assert(cyr > 0 && mixed, s"doc $id: cyrillic seed lost")
        case 2 => assert(cjk > 0 && mixed, s"doc $id: cjk seed lost")
        case 3 => assert(ara > 0 && mixed, s"doc $id: arabic seed lost")
        case _ =>
          assert(cyr == 0 && cjk == 0 && ara == 0 && !mixed,
            s"doc $id: clean doc saw a non-latin count")
          assert(dom === "latin", s"doc $id: dominant=$dom")
      }
    }
  }

  test("q198 readability: counts are consistent and both scores " +
    "re-derive from the row's own ratios") {
    val rows = Queries.byName("q198_readability").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s0, syl) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_syllables"))
      // one '.' every 7 tokens plus one on the last token
      assert(s0 === (w + 6) / 7, s"doc ${r.get(0)}: $w words, $s0 sentences")
      assert(syl >= w, "every word has at least one vowel group here")
      val (wps, spw) = (r.getAs[Double]("wps"), r.getAs[Double]("spw"))
      def r6(v: Double) = math.round(v * 1e6) / 1e6
      assert(wps === r6(w.toDouble / s0) && spw === r6(syl.toDouble / w))
      assert(r.getAs[Double]("fk_grade") ===
        r6(0.39 * wps + 11.8 * spw - 15.59) + 0.0)
      assert(r.getAs[Double]("flesch_ease") ===
        r6(206.835 - 1.015 * wps - 84.6 * spw) + 0.0)
    }
  }

  test("q199 k-anonymity: classes partition the table, k_min and the " +
    "risk flags tie out") {
    val rows = Queries.byName("q199_k_anonymity").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.customer(spark, sf).count()
    val sizes = rows.map(_.getAs[Long]("class_size"))
    assert(sizes.sum === total, "equivalence classes must partition")
    val kMin = rows.head.getAs[Long]("k_min")
    assert(rows.forall(_.getAs[Long]("k_min") == kMin) &&
      kMin === sizes.min)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("risky") === (r.getAs[Long]("class_size") < 5))
      val l = r.getAs[Long]("l_diversity")
      assert(l >= 1 && l <= 2, s"boolean sensitive attribute: l=$l")
    }
  }

  test("fellegiSunter: hand-computed weights on a 4-pair fixture, " +
    "u clamped, agree positive / disagree negative") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 11L, true, true), (2L, 12L, true, false),
      (3L, 13L, false, true), (4L, 14L, false, false))
      .toDF("a", "b", "f1", "f2")
    val out = graft.operators.RecordLinkage
      .fellegiSunter(pairs, Seq("f1", "f2"), Seq(0.9, 0.8))
      .collect().map(r => (r.getAs[Long]("a"), r)).toMap
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    // u_f1 = u_f2 = 2/4 = 0.5 (inside the clamp); agree weight
    // log2(m/0.5), disagree log2((1−m)/0.5)
    val w1a = r6(math.log(0.9 / 0.5) / math.log(2))
    val w2d = r6(math.log((1.0 - 0.8) / 0.5) / math.log(2))
    val row2 = out(2L)
    assert(row2.getAs[Double]("w_f1") === w1a)
    assert(row2.getAs[Double]("w_f2") === w2d)
    assert(row2.getAs[String]("pattern") === "10")
    assert(row2.getAs[Double]("score") === r6(w1a + w2d) + 0.0)
    assert(out(1L).getAs[Double]("score") > 0 &&
      out(4L).getAs[Double]("score") < 0)
    // a constant-true field clamps u to 1 − 1/n instead of log2(·/1)
    val allAgree = Seq((1L, true), (2L, true)).toDF("a", "f")
    val w = graft.operators.RecordLinkage
      .fellegiSunter(allAgree, Seq("f"), Seq(0.9))
      .head().getAs[Double]("w_f")
    assert(!w.isInfinite && w === r6(math.log(0.9 / 0.5) / math.log(2)))
  }

  test("q197 linkage: exact twins classify match, matches are only " +
    "true pairs, ghosts never surface") {
    val rows = Queries.byName("q197_record_linkage").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => ((r.getAs[Long]("a_key"),
      r.getAs[Long]("b_key")), r)).toMap
    // names are unique per key, so pattern 1xx ⇒ the clean twin ⇒ a
    // score past the upper threshold: match ⇔ is_true here
    rows.foreach { r =>
      if (r.getAs[String]("classification") == "match")
        assert(r.getAs[Boolean]("is_true"),
          s"false positive at ${r.getAs[Long]("a_key")}")
      val (a, b) = (r.getAs[Long]("a_key"), r.getAs[Long]("b_key"))
      assert(!(b - 1000000 == a && a % 3 == 2),
        s"ghost self-pair $a surfaced with score ${r.getAs[Double]("score")}")
    }
    // every clean twin (key%3=0) must be recovered as a match
    val cleanKeys = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    cleanKeys.foreach { k =>
      val r = byPair.get((k, k + 1000000))
      assert(r.isDefined, s"clean twin $k not recovered")
      assert(r.get.getAs[String]("classification") === "match")
    }
  }

  test("q203 Benford: nine digit classes partition the rows, expected " +
    "shares follow log10(1+1/d), chi terms non-negative") {
    val rows = Queries.byName("q203_benford_audit").run(spark, sf)
      .collect()
    assert(rows.map(_.getAs[String]("digit")).toSeq ==
      (1 to 9).map(_.toString))
    val total = Tables.lineitem(spark, sf)
      .filter(col("l_extendedprice") >= 1).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum === total)
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    rows.foreach { r =>
      val d = r.getAs[String]("digit").toInt
      assert(r.getAs[Double]("exp_share") === r6(math.log10(1.0 + 1.0 / d)))
      assert(r.getAs[Double]("chi_term") >= 0.0)
    }
  }

  test("q204 FD audit: the seeded segment FD breaks on exactly the " +
    "rotated keys while the name FD holds") {
    val rows = Queries.byName("q204_fd_violations").run(spark, sf)
      .collect().map(r => r.getAs[String]("fd") -> r).toMap
    val nKeys = Tables.customer(spark, sf).count()
    val seeded = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 7 === 0).count()
    val seg = rows("c_custkey->c_mktsegment")
    assert(seg.getAs[Long]("n_keys") === nKeys)
    assert(seg.getAs[Long]("n_violating") === seeded,
      "every rotated key (and only those) must violate")
    assert(!seg.getAs[Boolean]("holds"))
    val nm = rows("c_custkey->c_name")
    assert(nm.getAs[Long]("n_violating") === 0L &&
      nm.getAs[Boolean]("holds"))
  }

  test("q205 basket rules: metrics re-derive from raw co-occurrence " +
    "counts and ordering is by pair support") {
    val rows = Queries.byName("q205_basket_rules").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val nPairs = rows.map(_.getAs[Long]("n_pair"))
    assert(nPairs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val nBaskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct().count()
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    rows.take(10).foreach { r =>
      val (np, na, nb) = (r.getAs[Long]("n_pair"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(np >= 2 && np <= math.min(na, nb))
      assert(r.getAs[Double]("support") === r6(np.toDouble / nBaskets))
      assert(r.getAs[Double]("conf_a_b") === r6(np.toDouble / na))
      assert(r.getAs[Double]("lift_a_b") ===
        r6(r6(np.toDouble / na) / r6(nb.toDouble / nBaskets)))
    }
  }

  test("q206 Neyman allocation: budget is conserved up to rounding " +
    "and shares normalize") {
    val rows = Queries.byName("q206_neyman_allocation").run(spark, sf)
      .collect()
    assert(rows.length === 5)
    val allocs = rows.map(_.getAs[Long]("alloc"))
    assert(math.abs(allocs.sum - 500L) <= 3,
      s"allocation drifted from the budget: ${allocs.sum}")
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("s_h") > 0.0)
      assert(r.getAs[Long]("alloc") >= 0)
    }
  }

  test("q207 EM refinement: the name field's m sharpens toward 1 on " +
    "the seeded registry and every weight stays finite") {
    val rows = Queries.byName("q207_em_linkage").run(spark, sf)
      .collect().map(r => r.getAs[String]("field") -> r).toMap
    assert(rows.keySet === Set("band", "name", "seg"))
    rows.values.foreach { r =>
      Seq("u", "m1", "w_agree0", "w_agree1", "w_disagree0",
        "w_disagree1").foreach { c =>
        val v = r.getAs[Double](c)
        assert(!v.isNaN && !v.isInfinite, s"$c is $v")
      }
      assert(r.getAs[Double]("m1") > 0.0 && r.getAs[Double]("m1") < 1.0)
    }
    // classified matches are the clean twins, whose names agree —
    // the re-estimated m_name clamps just under 1 and its agree
    // weight must not fall below the textbook prior's
    val name = rows("name")
    assert(name.getAs[Double]("m1") > 0.9)
    assert(name.getAs[Double]("w_agree1") >= name.getAs[Double]("w_agree0"))
  }

  test("q208 transitions: counts conserve per-user event chains and " +
    "each row's probabilities normalize") {
    val rows = Queries.byName("q208_transition_matrix").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val totalTransitions = rows.map(_.getAs[Long]("n")).sum
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") - 1)).head().getLong(0)
    assert(totalTransitions === expected,
      "every consecutive per-user pair is exactly one transition")
    rows.groupBy(_.getAs[String]("prev_type")).values.foreach { g =>
      val rowTotal = g.head.getAs[Long]("row_total")
      assert(g.map(_.getAs[Long]("n")).sum === rowTotal)
      assert(math.abs(g.map(_.getAs[Double]("p")).sum - 1.0) < 1e-4)
    }
  }

  test("q209 CUSUM: the closed prefix form equals the textbook " +
    "recursion replayed on the collected series") {
    val rows = Queries.byName("q209_cusum_alarm").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    rows.groupBy(_.getAs[String]("event_type")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[java.sql.Date]("day").toString)
      val ys = sorted.map(_.getAs[Double]("y"))
      val n = ys.length.toDouble
      // mirror the query's exact-decimal moment chain: sx/sxx as
      // exact sums closed to doubles once, then the double formula
      val sx = ys.map(BigDecimal(_)).sum.toDouble
      val sxx = ys.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble
      val sd = r6(math.sqrt((n * sxx - sx * sx) / (n * (n - 1))))
      val mu = BigDecimal(r6(sx / n))
      val k = BigDecimal(r6(0.5 * sd))
      var (sp, sn) = (BigDecimal(0), BigDecimal(0))
      sorted.foreach { r =>
        val y = BigDecimal(r.getAs[Double]("y"))
        sp = (sp + (y - mu - k)).max(0)
        sn = (sn + (y - mu + k)).min(0)
        assert(r.getAs[Double]("s_pos") === r6(sp.toDouble),
          s"${r.getAs[String]("event_type")} ${r.get(1)}: s_pos drifted")
        assert(r.getAs[Double]("s_neg") === r6(sn.toDouble))
      }
    }
  }

  test("q210 Kaplan-Meier: risk set shrinks by prior removals, " +
    "survival is non-increasing, and drops only at death times") {
    val rows = Queries.byName("q210_kaplan_meier").run(spark, sf)
      .collect().sortBy(_.getAs[Int]("t"))
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getAs[Long]("d") + r.getAs[Long]("c")).sum
      === nUsers, "every user dies or is censored exactly once")
    assert(rows.head.getAs[Long]("n_at_risk") === nUsers)
    var removed = 0L
    var prevS = 1.0
    rows.foreach { r =>
      assert(r.getAs[Long]("n_at_risk") === nUsers - removed)
      removed += r.getAs[Long]("d") + r.getAs[Long]("c")
      val sv = r.getAs[Double]("survival")
      assert(sv <= prevS + 1e-12 && sv >= 0.0)
      if (r.getAs[Long]("d") == 0) assert(sv === prevS,
        "censoring alone must not move the curve")
      prevS = sv
    }
  }

  test("q211 A/B z-test: the statistic re-derives from the four " +
    "counts and arms partition the users") {
    val r = Queries.byName("q211_ab_ztest").run(spark, sf).head()
    val (na, xa, nb, xb) = (r.getAs[Long]("n_a"), r.getAs[Long]("x_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("x_b"))
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(na + nb === nUsers)
    assert(xa <= na && xb <= nb && xa + xb > 0 && xa + xb < na + nb,
      "conversion must be non-degenerate for the pooled variance")
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val z = r6((pa - pb) /
      math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))) + 0.0
    assert(r.getAs[Double]("z") === z)
    assert(r.getAs[Boolean]("significant") === (math.abs(z) > 1.96))
  }

  test("q212 FK sweep: six clean edges, the seeded dirty edge alone " +
    "reports its exact orphan counts") {
    val rows = Queries.byName("q212_fk_orphans").run(spark, sf)
      .collect().map(r => r.getAs[String]("fk") -> r).toMap
    assert(rows.size === 7)
    val seeded = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 11 === 0).count()
    rows.foreach { case (fk, r) =>
      if (fk == "orders.o_custkey->customer") {
        assert(r.getAs[Long]("n_orphan_rows") === seeded)
        assert(!r.getAs[Boolean]("ok"))
        assert(r.getAs[Long]("n_orphan_keys") > 0)
      } else {
        assert(r.getAs[Long]("n_orphan_rows") === 0L, s"$fk not clean")
        assert(r.getAs[Boolean]("ok"))
      }
    }
  }

  test("q213 Lorenz: deciles partition the customers, the curve is " +
    "monotone and ends at 1, and the Gini is consistent") {
    val rows = Queries.byName("q213_lorenz_gini").run(spark, sf)
      .collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.nonEmpty && rows.length <= 10)
    val nCustomers = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === nCustomers)
    val cum = rows.map(_.getAs[Double]("cum_rev"))
    assert(cum.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(math.abs(cum.last - 1.0) < 1e-6)
    val gini = rows.head.getAs[Double]("gini")
    assert(rows.forall(_.getAs[Double]("gini") == gini))
    assert(gini >= -1e-6 && gini < 1.0)
    // re-derive the trapezoid sum from the rows themselves
    def r6(v: Double) = math.round(v * 1e6) / 1e6
    var prev = 0.0
    var s = 0.0
    rows.foreach { r =>
      s += r6((r.getAs[Double]("cum_rev") + prev)
        * r.getAs[Double]("pop_share"))
      prev = r.getAs[Double]("cum_rev")
    }
    assert(math.abs(gini - (1.0 - s)) < 1e-5)
  }

  test("q214 bootstrap CI: interval brackets the observed mean and " +
    "the replicate spread is positive") {
    val r = Queries.byName("q214_bootstrap_ci").run(spark, sf).head()
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    val mean = r.getAs[Double]("mean_obs")
    val se = r.getAs[Double]("se_boot")
    assert(lo <= hi && se > 0.0)
    assert(r.getAs[Long]("b") === 64L)
    // the percentile interval must cover the point estimate at B=64
    // on this well-behaved mean
    assert(mean >= lo - 3 * se && mean <= hi + 3 * se)
  }

  test("q200 matryoshka recall: one row per query, overlap within " +
    "[0, 5], recall re-derives from the overlap") {
    val rows = Queries.byName("q200_matryoshka_recall").run(spark, sf)
      .collect()
    val nQueries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 16).count()
    assert(rows.length.toLong === nQueries)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 5)
      assert(r.getAs[Double]("recall") ===
        math.round(n / 5.0 * 1e6) / 1e6)
    }
  }

  test("q196 prototype pruning: keeps exactly the hard half per label " +
    "and ranks the prototype first") {
    val rows = Queries.byName("q196_prototype_prune").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("label")).foreach { case (label, rs) =>
      val n = rs.head.getAs[Long]("n_label")
      assert(rs.length.toLong === n, s"label $label: window count drifted")
      val kept = rs.count(_.getAs[Boolean]("kept"))
      assert(kept.toLong === n - n / 2,
        s"label $label: kept $kept of $n — not the hard half")
      // rank 1 (most prototypical, smallest distance) is always dropped
      // when the class has ≥ 2 members
      val rank1 = rs.find(_.getAs[Long]("proto_rank") == 1L).get
      if (n >= 2) assert(!rank1.getAs[Boolean]("kept"))
      rs.foreach(r => assert(r.getAs[Double]("dist") >= 0.0))
    }
  }

  test("q235 padding waste: token conservation per seq_len row and " +
    "utilization re-derives") {
    val total = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    val rows = Queries.byName("q235_padding_waste").run(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("seq_len")).toSeq ==
      Seq(64L, 128L, 256L, 512L))
    rows.foreach { r =>
      val (l, d) = (r.getAs[Long]("seq_len"), r.getAs[Long]("n_docs"))
      val used = l * d - r.getAs[Long]("tokens_padded")
      // conservation: used tokens + truncated tokens = corpus tokens
      assert(used + r.getAs[Long]("tokens_lost") === total,
        s"seq_len $l: token conservation broke")
      assert(r.getAs[Double]("utilization") ===
        math.round(used.toDouble / (l * d).toDouble * 1e6) / 1e6)
    }
  }
}
