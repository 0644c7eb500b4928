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
    * duplicate crawls never pay the extraction chain. */
  def webExtraction(blockedDomains: Seq[String] = Nil,
      blockedTerms: Seq[String] = Nil,
      languageGate: Option[(LanguageIdentifierModel, Seq[String])] = None,
      urlDedupIdCol: Option[String] = None,
      languageMinProb: Double = 0.0)
      : Pipeline = {
    require(languageGate.isDefined || languageMinProb == 0.0,
      "languageMinProb only takes effect inside a languageGate — pass " +
        "languageGate = Some((model, keepLanguages)) or drop the floor")
    val urlDedupStages = urlDedupIdCol.toSeq.flatMap { id =>
      Seq(
        new UrlNormalizer().setInputCol("url").setOutputCol("__url_norm"),
        new graft.dedup.ExactDeduplicator().setInputCol("__url_norm")
          .setIdCol(id).setRawKey(true),
        new Lambda().setTransform(_.drop("__url_norm")))
    }
    val langStages = languageGate.toSeq.flatMap { case (m, keep) =>
      Seq(
        m.copy(org.apache.spark.ml.param.ParamMap.empty)
          .setInputCol("__repaired"),
        new Lambda().setTransform(df => df
          .filter(col("lang_pred").isin(keep.map(k => k: Any): _*) &&
            col("lang_prob") >= languageMinProb)
          .drop("lang_pred", "lang_prob")))
    }
    new Pipeline().setStages((Seq(
      new UrlFilter().setInputCol("url")
        .setBlockedDomains(blockedDomains).setBlockedTerms(blockedTerms)) ++
      urlDedupStages ++ Seq(
      new HtmlTextExtractor().setInputCol("html").setOutputCol("__extracted"),
      new MojibakeRepair().setInputCol("__extracted")
        .setOutputCol("__repaired")) ++
      langStages ++ Seq(
      new C4Filter().setInputCol("__repaired").setOutputCol("text"),
      new Lambda().setTransform(
        _.drop("__extracted", "__repaired", "html")))).toArray)
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
}
