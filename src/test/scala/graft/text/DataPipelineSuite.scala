package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class DataPipelineSuite extends TestBase {
  import spark.implicits._

  // ---- Decontamination --------------------------------------------------

  test("Decontamination flags exactly the docs sharing a 4-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma delta"
      (2L, "zeta eta theta iota kappa"),      // no overlap
      (3L, "x alpha beta gamma delta"),       // shares (offset position)
      (4L, "alpha beta gamma"))               // only 3 words — no 4-gram
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val flagged = Decontamination
      .flag(corpus, bench, "text", "doc_id")
      .select("doc_id", "is_contaminated").as[(Long, Int)].collect().toMap
    assert(flagged == Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0))
    val survivors = Decontamination
      .clean(corpus, bench, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.sameElements(Array(2L, 4L)))
  }

  test("Decontamination.overlapProfile grades overlap with q4 fractions") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // 2 distinct 4-grams, 1 hit
      (2L, "zeta eta theta iota kappa"),      // 2 distinct, 0 hits
      (4L, "alpha beta gamma"))               // 3 words: no 4-gram at all
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Decontamination
      .overlapProfile(corpus, bench, "text", "doc_id")
      .select("doc_id", "n_grams", "n_hit", "overlap_q4")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 5000L)))
    assert(got(2L) == ((2L, 2L, 0L, 0L)))
    assert(got(4L) == ((4L, 0L, 0L, 0L)))
  }

  test("Decontamination.overlapProfile bounds the benchmark broadcast, naming the knob") {
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val bench = Seq((2L, "a b c d e f")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Decontamination.overlapProfile(corpus, bench, "text", "doc_id",
        maxBenchmarkGrams = 1L)
    }
    assert(e.getMessage.contains("maxBenchmarkGrams"))
  }

  test("Decontamination broadcast and shuffle paths agree") {
    val docs = sfTable("documents")
    val corpus = docs.filter($"source" =!= "src0")
    val bench = docs.filter($"source" === "src0")
    val a = Decontamination
      .contaminatedIds(corpus, bench, "text", "doc_id", broadcastBenchmark = true)
      .as[Long].collect().sorted
    val b = Decontamination
      .contaminatedIds(corpus, bench, "text", "doc_id", broadcastBenchmark = false)
      .as[Long].collect().sorted
    assert(a.sameElements(b) && a.nonEmpty)
  }

  // ---- PIIRedactor ------------------------------------------------------

  test("PIIRedactor redacts all builtin kinds with fixed order") {
    val df = Seq(
      "mail a.user+tag@sub.example.org now",
      "ssn 123-45-6789 phone 555-867-5309 also 555 867 5309",
      "host 192.168.0.1 plain 1234-5678 none",
      "no pii here").toDF("t")
    val out = new PIIRedactor().setInputCol("t").setOutputCol("r")
      .transform(df).select("r").as[String].collect()
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "ssn <SSN> phone <PHONE> also <PHONE>")
    assert(out(2) == "host <IP> plain 1234-5678 none")
    assert(out(3) == "no pii here")
  }

  test("PIIRedactor kinds subset only applies selected patterns") {
    val df = Seq("a@b.co and 10.0.0.1").toDF("t")
    val out = new PIIRedactor().setInputCol("t").setOutputCol("r")
      .setKinds(Seq("email")).transform(df).select("r").as[String].head()
    assert(out == "<EMAIL> and 10.0.0.1")
  }

  // ---- RepetitionProfiler ----------------------------------------------

  test("RepetitionProfiler hand-computed signals") {
    // "a b a b a": words=5 distinct=2 -> dup_word=(5-2)/5=0.6 -> 6000
    // 2-grams: [a b, b a, a b, b a] n2=4; counts {a b:2, b a:2}
    //   top=2 -> top_q4=5000; dup occurrences=4 -> dup_q4=10000
    val df = Seq((1L, "a b a b a"), (2L, "x y z w")).toDF("id", "t")
    val r = new RepetitionProfiler().setInputCol("t").transform(df)
      .select("id", "n_words", "dup_word_q4", "top_2gram_count",
        "top_2gram_q4", "dup_2gram_q4")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 5L, 6000L, 2L, 5000L, 10000L)))
    // all-unique doc: no duplication anywhere
    assert(r(1) == ((2L, 4L, 0L, 1L, 3333L, 0L)))
  }

  test("RepetitionProfiler single-word and two-word edges") {
    val df = Seq((1L, "solo"), (2L, "pair pair")).toDF("id", "t")
    val r = new RepetitionProfiler().setInputCol("t").transform(df)
      .select("id", "n_words", "top_2gram_count", "dup_2gram_q4")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 1L, 0L, 0L)))  // no 2-grams at all
    assert(r(1) == ((2L, 2L, 1L, 0L)))  // one 2-gram, trivially unique
  }

  // ---- DomainMixtureSampler --------------------------------------------

  test("DomainMixtureSampler is deterministic and weight-monotonic") {
    val docs = sfTable("documents")
    def kept(w: Double): Set[Long] = new DomainMixtureSampler()
      .setWeights(Map.empty).setDefaultWeight(w)
      .transform(docs).select("doc_id").as[Long].collect().toSet
    val k50a = kept(0.5); val k50b = kept(0.5)
    assert(k50a == k50b, "same salt+weights must reproduce the same sample")
    assert(kept(1.0).size == docs.count())
    assert(kept(0.0).isEmpty)
    assert(kept(0.25).subsetOf(k50a),
      "lower weight must keep a subset (nested thresholds)")
    // 500 docs at w=0.5: expect ~250, allow generous binomial slack
    assert(math.abs(k50a.size - 250) < 75)
  }

  test("DomainMixtureSampler per-domain weights and salt independence") {
    val docs = sfTable("documents")
    val out = new DomainMixtureSampler()
      .setWeights(Map("src0" -> 1.0, "src1" -> 0.0))
      .setDefaultWeight(0.5)
      .transform(docs).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(out("src0") == 25 && !out.contains("src1"))
    val s1 = new DomainMixtureSampler().setDefaultWeight(0.5).setSalt("a")
      .transform(docs).select("doc_id").as[Long].collect().toSet
    val s2 = new DomainMixtureSampler().setDefaultWeight(0.5).setSalt("b")
      .transform(docs).select("doc_id").as[Long].collect().toSet
    assert(s1 != s2, "different salts must draw different samples")
  }

  test("hexThreshold encodes weights as ordered hex strings") {
    assert(DomainMixtureSampler.hexThreshold(1.0) == "g")
    assert(DomainMixtureSampler.hexThreshold(0.0) == "0")
    assert(DomainMixtureSampler.hexThreshold(0.5) == "80000000")
    assert(DomainMixtureSampler.hexThreshold(0.75) == "c0000000")
    assert(DomainMixtureSampler.hexThreshold(0.1) == "19999999")
  }

  // ---- TemperatureSampler ----------------------------------------------

  // skewed fixture: a×8, b×4, c×2 docs
  private lazy val skewed = ((0 until 8).map(i => (i.toLong, "a")) ++
    (8 until 12).map(i => (i.toLong, "b")) ++
    (12 until 14).map(i => (i.toLong, "c"))).toDF("doc_id", "dom")

  test("TemperatureSampler at tau=1 equals plain fraction sampling") {
    // p_d = n_d/N  =>  every rate is exactly targetFraction
    val t = new TemperatureSampler().setDomainCol("dom").setTemperature(1.0)
      .setTargetFraction(0.5).setSalt("s").transform(skewed)
    val plain = new DomainMixtureSampler().setDomainCol("dom")
      .setWeights(Map.empty).setDefaultWeight(0.5).setSalt("s")
      .transform(skewed)
    assertDFEq(t, plain)
  }

  test("TemperatureSampler flattens toward small domains, caps at 1") {
    // tau=0: p_d = 1/3 each; rates = min(1, 0.5*14*(1/3)/n_d) —
    // a: 7/24, b: 7/12, c: capped 1.0 (all kept)
    val out = new TemperatureSampler().setDomainCol("dom").setTemperature(0.0)
      .setTargetFraction(0.5).setSalt("s").transform(skewed)
    val c = out.filter(col("dom") === "c").count()
    assert(c == 2L, "rate-1 cap must keep every doc of the tiny domain")
    // exact replay through DomainMixtureSampler with the closed-form rates
    val n = 14.0; val z = 3.0
    val rates = Map(
      "a" -> math.min(1.0, 0.5 * n * (1.0 / z) / 8.0),
      "b" -> math.min(1.0, 0.5 * n * (1.0 / z) / 4.0),
      "c" -> math.min(1.0, 0.5 * n * (1.0 / z) / 2.0))
    val manual = new DomainMixtureSampler().setDomainCol("dom")
      .setWeights(rates).setDefaultWeight(0.0).setSalt("s")
      .transform(skewed)
    assertDFEq(out, manual)
  }

  test("TemperatureSampler keeps the md5-threshold nesting property") {
    // for a FIXED domain, a smaller target fraction must keep a subset
    // (same salt, same hash keys, lower threshold) — the property that
    // makes repeated downsampling monotone instead of re-rolling
    def kept(f: Double): Set[Long] = new TemperatureSampler()
      .setDomainCol("dom").setTemperature(0.5).setTargetFraction(f)
      .setSalt("s").transform(skewed)
      .select("doc_id").as[Long].collect().toSet
    val k25 = kept(0.25); val k50 = kept(0.5)
    assert(k25.subsetOf(k50),
      "lower fraction must keep a nested subset per domain")
  }

  test("TemperatureSampler fails fast past the domain cap") {
    intercept[IllegalArgumentException] {
      new TemperatureSampler().setDomainCol("dom").setMaxDomains(2)
        .transform(skewed)
    }
  }

  test("TokenBudgetSampler: realized tokens track the budget, partitioning-free") {
    // 8000 docs over two domains with very different doc lengths
    val docs = (0L until 8000L)
      .map(i => (i, if (i % 2 == 0) "web" else "code", (i % 37 + 5)))
      .toDF("doc_id", "dom", "n_toks")
    val totals = docs.groupBy("dom").agg(sum("n_toks").as("t"))
      .as[(String, Long)].collect().toMap
    val budget = Map("web" -> totals("web") / 4, "code" -> totals("code"))
    val s = new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setBudgets(budget).setSalt("t1")
    val kept = s.transform(docs).groupBy("dom").agg(sum("n_toks").as("k"))
      .as[(String, Long)].collect().toMap
    // web: rate 1/4 — realized token mass within 15% of the budget
    val web = kept("web").toDouble / budget("web")
    assert(web > 0.85 && web < 1.15, s"web realized/budget = $web")
    // code budgeted at its total: keep-all
    assert(kept("code") == totals("code"))
    // deterministic + partitioning-independent
    val a = s.transform(docs).select("doc_id").as[Long].collect().toSet
    val b = s.transform(docs.repartition(13)).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
    // unlisted domain: default -1 keeps all, default 0 drops all
    val extra = Seq((90001L, "new", 10L)).toDF("doc_id", "dom", "n_toks")
    assert(s.transform(extra).count() == 1)
    assert(new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setDefaultBudget(0L)
      .transform(extra).count() == 0)
  }

  test("TokenBudgetSampler exact: hard cap with one-doc overshoot") {
    val docs = (0L until 500L).map(i => (i, "d", i % 23 + 7))
      .toDF("doc_id", "dom", "n_toks")
    val total = docs.agg(sum("n_toks")).as[Long].head()
    val bud = 900L
    val s = new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setBudgets(Map("d" -> bud)).setExact(true)
    val out = s.transform(docs)
    val keptToks = out.agg(sum("n_toks")).as[Long].head()
    val maxDoc = out.agg(max("n_toks")).as[Long].head()
    // greedy prefix: reaches the budget, overshoots by less than the
    // last kept doc
    assert(keptToks >= bud && keptToks < bud + maxDoc,
      s"kept $keptToks vs budget $bud (maxDoc $maxDoc)")
    // the schema passes through untouched (the window temp is dropped)
    assert(out.columns.toSeq == Seq("doc_id", "dom", "n_toks"))
    // partitioning-independent
    assert(s.transform(docs.repartition(11)).select("doc_id")
      .as[Long].collect().toSet ==
      out.select("doc_id").as[Long].collect().toSet)
    // positive budget keeps at least one doc even if every doc is bigger
    val big = Seq((1L, "d", 500L), (2L, "d", 400L)).toDF("doc_id", "dom", "n_toks")
    assert(new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setBudgets(Map("d" -> 10L)).setExact(true)
      .transform(big).count() == 1)
    // budget 0 drops the domain; uncapped default keeps all
    assert(new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setBudgets(Map("d" -> 0L)).setExact(true)
      .transform(big).count() == 0)
    assert(new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setExact(true).transform(big).count() == 2)
  }

  test("TokenBudgetSampler budgets the null-domain group like exact mode") {
    // null domains can't key the literal rate map; the policy (pinned
    // round 15) is to budget the null GROUP through defaultWeight at
    // its own token total — the same rule exact mode realizes via
    // coalesce(bMap[dom], defaultBudget) over the null partition
    val docs = ((0L until 2000L).map(i => (i, null: String, i % 31 + 5)) ++
      (2000L until 3000L).map(i => (i, "web", i % 31 + 5)))
      .toDF("doc_id", "dom", "n_toks")
    val nullTotal = docs.filter($"dom".isNull)
      .agg(sum("n_toks")).as[Long].head()
    val s = new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setBudgets(Map("web" -> 999999L))
      .setDefaultBudget(nullTotal / 4).setSalt("nd")
    val kept = s.transform(docs).filter($"dom".isNull)
      .agg(sum("n_toks")).as[Long].head()
    val ratio = kept.toDouble / (nullTotal / 4)
    assert(ratio > 0.85 && ratio < 1.15, s"null realized/budget = $ratio")
    // edges agree with exact mode: 0 drops the group, -1 keeps it all
    def nullsKept(b: Long, ex: Boolean): Long =
      new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
        .setTokensCol("n_toks").setDefaultBudget(b).setExact(ex)
        .transform(docs).filter($"dom".isNull).count()
    assert(nullsKept(0L, ex = false) == 0 && nullsKept(0L, ex = true) == 0)
    assert(nullsKept(-1L, ex = false) == 2000 &&
      nullsKept(-1L, ex = true) == 2000)
  }

  test("samplers saturate the maxDomains cap at Int.MaxValue") {
    // limit(cap + 1) must not overflow negative at the uncapped setting
    // (the UrlFilter.filterByDomainTable saturation, round 15)
    val docs = (0L until 100L).map(i => (i, s"d${i % 3}", i % 7 + 1))
      .toDF("doc_id", "dom", "n_toks")
    assert(new TokenBudgetSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTokensCol("n_toks").setBudgets(Map("d0" -> 1000L))
      .setMaxDomains(Int.MaxValue).transform(docs).count() > 0)
    assert(new TemperatureSampler().setIdCol("doc_id").setDomainCol("dom")
      .setTemperature(0.5).setTargetFraction(0.5)
      .setMaxDomains(Int.MaxValue).transform(docs).count() > 0)
  }

  test("output-column clashes fail at transformSchema, not late at transform") {
    val schema = (0L until 4L).map(i => (i, "d", 0L))
      .toDF("doc_id", "split", "epoch").schema
    val e1 = intercept[IllegalArgumentException] {
      new DeterministicSplitter().setIdCol("doc_id").transformSchema(schema)
    }
    assert(e1.getMessage.contains("split"))
    val e2 = intercept[IllegalArgumentException] {
      new DomainUpsampler().setIdCol("doc_id").setDomainCol("d")
        .transformSchema(schema)
    }
    assert(e2.getMessage.contains("epoch"))
  }

  test("DeterministicSplitter: disjoint, stable, partitioning-independent") {
    val docs = (0L until 10000L).toDF("doc_id")
    val s = new DeterministicSplitter().setIdCol("doc_id")
      .setSplits(Map("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .setSalt("s1")
    val out = s.transform(docs)
    val byName = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    // every row assigned (fractions sum to 1), roughly proportional
    assert(byName.values.sum == 10000 && !byName.contains(null))
    assert(byName("train") > 8700 && byName("train") < 9300)
    assert(byName("val") > 300 && byName("val") < 700)
    // the SAME doc gets the SAME split under any partitioning — the
    // property randomSplit lacks
    val a = out.orderBy("doc_id").as[(Long, String)].collect()
    val b = s.transform(docs.repartition(17)).orderBy("doc_id")
      .as[(Long, String)].collect()
    assert(java.util.Arrays.deepEquals(
      a.map(x => x: AnyRef), b.map(x => x: AnyRef)))
    // leftover mass is an explicit null band
    val partial = new DeterministicSplitter().setIdCol("doc_id")
      .setSplits(Map("train" -> 0.5)).setSalt("s1").transform(docs)
    val n = partial.filter(col("split").isNull).count()
    assert(n > 4600 && n < 5400, s"null band $n")
    // guards: bad fractions and a taken output column fail fast
    intercept[IllegalArgumentException] {
      new DeterministicSplitter().setSplits(Map("a" -> 0.7, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      s.transform(docs.withColumn("split", lit(1)))
    }
  }

  test("DomainUpsampler repeats by floor + deterministic fraction") {
    val docs = (0L until 400L).map(i => (i, s"d${i % 4}"))
      .toDF("doc_id", "dom")
    val out = new DomainUpsampler().setIdCol("doc_id").setDomainCol("dom")
      .setWeights(Map("d0" -> 2.5, "d1" -> 1.0, "d2" -> 0.25, "d3" -> 0.0))
      .transform(docs)
    val per = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    // d0: 100 docs -> 200 guaranteed + ~50 fractional copies
    assert(per("d0") >= 200L && per("d0") <= 300L)
    assert(per.get("d3").isEmpty, "weight 0 drops the domain")
    assert(per("d1") == 100L)
    assert(per("d2") > 0L && per("d2") < 100L)
    // epochs are dense 0..copies-1 per doc
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("epoch").as("m"), min("epoch").as("lo"))
      .filter(col("m") =!= col("n") - 1 || col("lo") =!= 0).count()
    assert(bad == 0)
    // deterministic + partitioning-independent
    val again = new DomainUpsampler().setIdCol("doc_id").setDomainCol("dom")
      .setWeights(Map("d0" -> 2.5, "d1" -> 1.0, "d2" -> 0.25, "d3" -> 0.0))
      .transform(docs.repartition(7))
    assertDFEq(out, again)
    // nesting: raising a weight only ADDS copies
    val lower = new DomainUpsampler().setIdCol("doc_id").setDomainCol("dom")
      .setWeights(Map("d0" -> 1.5, "d1" -> 1.0, "d2" -> 0.25, "d3" -> 0.0))
      .transform(docs).select("doc_id", "epoch")
    assert(lower.exceptAll(out.select("doc_id", "epoch")).count() == 0)
  }

  test("gram-explode plans never inline the tokenizer into a lambda") {
    // regression guard for the inferred-generator-filter trap (round
    // 12): InferFiltersFromGenerate + predicate pushdown used to land a
    // filter at the scan with `slice(split(text), i, n)` inside the
    // per-window lambda — the O(len²) re-tokenization, synthesized by
    // the optimizer, invisible in operator code. The index-explode
    // shape keeps every slice() over an attribute; `slice(split` in an
    // optimized plan means the trap is back.
    val docs = sfTable("documents")
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val plans = Seq(
      "decontaminate.flag" -> Decontamination
        .flag(corpus, bench, "text", "doc_id"),
      "frequent_ngrams" -> new FrequentNGrams().setInputCol("text")
        .transform(docs),
      "dsir.fit counts" -> new DSIRScorer().setInputCol("text")
        .setTargetPredicate("source = 'src0'").setVocabSize(16)
        .fit(docs).transform(docs),
      "sb.fit+transform" -> new StupidBackoffLM().setInputCol("text")
        .setVocabSize(64).setGramBudget(64).fit(docs.limit(50))
        .transform(docs.limit(50)),
      "exact_substring" -> new graft.text.ExactSubstringDeduplicator()
        .setInputCol("text").setMinMatchTokens(5).transform(docs))
    for ((name, df) <- plans) {
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("slice(split"),
        s"$name: tokenizer inlined into a window lambda:\n" +
          p.linesIterator.filter(_.contains("slice(split"))
            .take(2).mkString("\n"))
    }
  }
}
