package graft.text

import org.apache.spark.ml.Pipeline
import graft.stages.Lambda
import org.apache.spark.sql.functions._

/** Pre-assembled curation pipelines — the standard orderings of this
  * library's stages as plain SparkML `Pipeline`s, so a user gets the
  * published recipe in one call and still re-orders / re-parameterizes
  * by editing `getStages`. Stage order follows the public pipelines
  * (C4 / CCNet / RefinedWeb): cheap URL-level drops before byte-level
  * cleaning, cleaning before quality gating, quality gating before
  * the (only) shuffling stage, dedup.
  *
  * Every member is built from the individually-oracle-gated stages;
  * the suite runs each recipe end-to-end on the documents fixture and
  * the composition gates (`crawl_e2e`, `curation_e2e`) hash-pin the
  * chained-plan semantics the recipes rely on.
  */
object Recipes {

  /** Crawl response records → clean text: URL blocklist → HTML→text →
    * mojibake repair → [language gate] → C4 line/page cleaning. Input
    * column `url` + `html`; survivors end with clean text in `text`.
    *
    * `languageGate` is the CCNet/RefinedWeb position for trained
    * language id — right after byte repair, before the (language-
    * specific) C4 rules, so dropped-language pages never pay cleaning:
    * pass a fitted [[LanguageIdentifierModel]] plus the language codes
    * to keep; docs whose argmax language is not in the keep set are
    * dropped and the prediction columns do not survive the recipe.
    * `languageMinProb` additionally drops docs whose argmax confidence
    * is below the threshold (CCNet keeps pages only above 0.5 — low-
    * confidence pages are usually mixed-language or boilerplate).
    *
    * `urlDedupIdCol` enables RefinedWeb's first dedup stage: URL
    * canonicalization ([[UrlNormalizer]]) + exact dedup on the
    * canonical URL (raw-key — paths stay case-sensitive), keeping the
    * smallest id per page. It sits after the blocklist filter (narrow,
    * shuffle-free drops go first) and before HTML extraction, so
    * duplicate crawls never pay the extraction chain.
    *
    * Intermediate columns are named per-schema at transform time
    * (`findUnusedColumnName` — the library convention), so user
    * columns named `__extracted` and friends survive the recipe
    * intact (round 14; the old fixed names were silently dropped by
    * the cleanup stage). The recipe's OUTPUT contract columns remain
    * fixed by design: `text` (and the gate's transient
    * `lang_pred`/`lang_prob`) supersede same-named inputs.
    *
    * `qualityHead` is the FineWeb-Edu position for model-based quality
    * gating (extract → embed → head-score → threshold; public recipe:
    * Penedo et al. 2024, FineWeb): pass an embedder stage (any
    * transformer with inputCol/outputCol params emitting `Array`
    * vectors — [[HashedEmbedder]] or a fitted
    * [[TrainedEmbedderModel]]), a [[graft.nn.MLPScorer]] head, and the
    * keep threshold. The recipe wires the embedder to `text`, the head
    * to the embedder's output, keeps docs scoring AT OR ABOVE the
    * threshold, and drops both transient columns — a pure narrow chain,
    * zero added exchanges. Embedding once and re-thresholding per
    * experiment is the 100 TB workflow; re-running the whole recipe
    * re-embeds, so pipelines that sweep thresholds should split here. */
  def webExtraction(blockedDomains: Seq[String] = Nil,
      blockedTerms: Seq[String] = Nil,
      languageGate: Option[(LanguageIdentifierModel, Seq[String])] = None,
      urlDedupIdCol: Option[String] = None,
      languageMinProb: Double = 0.0,
      qualityHead: Option[(org.apache.spark.ml.Transformer,
        graft.nn.MLPScorer, Double)] = None)
      : Pipeline = {
    require(languageGate.isDefined || languageMinProb == 0.0,
      "languageMinProb only takes effect inside a languageGate — pass " +
        "languageGate = Some((model, keepLanguages)) or drop the floor")
    import graft.core.DatasetExtensions.findUnusedColumnName
    val urlDedupStages = urlDedupIdCol.toSeq.map { id =>
      new Lambda().setTransform { df =>
        val tmp = findUnusedColumnName("__url_norm", df.schema)
        val normed = new UrlNormalizer().setInputCol("url")
          .setOutputCol(tmp).transform(df)
        new graft.dedup.ExactDeduplicator().setInputCol(tmp)
          .setIdCol(id).setRawKey(true).transform(normed).drop(tmp)
      }
    }
    val extractStage = new Lambda().setTransform { df =>
      // distinct bases can never resolve to the same name
      val ext = findUnusedColumnName("__extracted", df.schema)
      val repaired = findUnusedColumnName("__repaired", df.schema)
      val extracted = new HtmlTextExtractor().setInputCol("html")
        .setOutputCol(ext).transform(df)
      val fixed = new MojibakeRepair().setInputCol(ext)
        .setOutputCol(repaired).transform(extracted)
      val gated = languageGate match {
        case None => fixed
        case Some((m, keep)) =>
          m.copy(org.apache.spark.ml.param.ParamMap.empty)
            .setInputCol(repaired).transform(fixed)
            .filter(col("lang_pred").isin(keep.map(k => k: Any): _*) &&
              col("lang_prob") >= languageMinProb)
            .drop("lang_pred", "lang_prob")
      }
      new C4Filter().setInputCol(repaired).setOutputCol("text")
        .transform(gated).drop(ext, repaired, "html")
    }
    val headStages = qualityHead.toSeq.map { case (embedder, head, thr) =>
      new Lambda().setTransform { df =>
        // wire copies (never the caller's instances) to the recipe's
        // contract columns; both stages' outputCol params name the
        // transient columns this stage drops after thresholding
        val e = embedder.copy(org.apache.spark.ml.param.ParamMap.empty)
        e.set(e.getParam("inputCol"), "text")
        val eOut = e.getOrDefault(e.getParam("outputCol")).toString
        val h = head.copy(org.apache.spark.ml.param.ParamMap.empty)
        h.set(h.getParam("inputCol"), eOut)
        val hOut = h.getOrDefault(h.getParam("outputCol")).toString
        h.transform(e.transform(df))
          .filter(col(hOut) >= thr).drop(eOut, hOut)
      }
    }
    new Pipeline().setStages(((
      new UrlFilter().setInputCol("url")
        .setBlockedDomains(blockedDomains).setBlockedTerms(blockedTerms)
        : org.apache.spark.ml.PipelineStage) +:
      (urlDedupStages ++ (extractStage +: headStages))).toArray)
  }

  /** Clean text → training corpus: Gopher structural signals +
    * threshold gate → exact dedup → deterministic shuffle order.
    * Expects `doc_id` and `text`; emits survivors with `shuffle_pos`.
    * Near-dup (MinHash/SemDeDup) and LM-perplexity gating compose the
    * same way — they are left out of the default because their
    * parameters are corpus-specific choices, not defaults. */
  def corpusCuration(minWords: Long = 50, maxBulletLineQ4: Long = 9000,
      seed: String = "42"): Pipeline =
    new Pipeline().setStages(Array(
      new GopherSignals().setInputCol("text"),
      new Lambda().setTransform(df => df
        .filter(col("gs_n_words") >= minWords &&
          col("gs_bullet_line_q4") <= maxBulletLineQ4)
        .drop(df.columns.filter(_.startsWith("gs_")).toIndexedSeq: _*)),
      new graft.dedup.ExactDeduplicator().setInputCol("text")
        .setIdCol("doc_id"),
      new CorpusShuffler().setIdCol("doc_id").setSeed(seed)))

  /** Cluster-balanced retention (the DataComp-LM / Nemotron topic-
    * rebalance shape, public recipes): embed → k-means topic clusters →
    * deterministic per-cluster doc cap. Expects `doc_id` and `text`;
    * survivors keep their `cluster` and `centroid_sim_q4` columns so a
    * downstream mixture report ([[CorpusReport]] `groupByCol`) can card
    * the balanced composition. Swap the fit-free [[HashedEmbedder]] for
    * [[TrainedEmbedder]] when semantic (not lexical) topics matter —
    * same `Array[Float]` contract, same plan shape. One narrow embed
    * pass + one bounded driver-side fit + the quota's bottom-k shuffle;
    * the corpus text is never globally sorted. */
  def clusterBalance(dim: Int = 64, k: Int = 64, capPerCluster: Int = 1000,
      salt: String = "balance"): Pipeline =
    new Pipeline().setStages(Array(
      new HashedEmbedder().setInputCol("text").setDim(dim),
      new graft.sim.EmbeddingClusterer().setInputCol("embedding")
        .setIdCol("doc_id").setK(k),
      new GroupQuotaSampler().setGroupCol("cluster").setIdCol("doc_id")
        .setCap(capPerCluster).setSalt(salt)))
}
