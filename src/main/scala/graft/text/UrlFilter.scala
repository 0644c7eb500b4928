package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** URL/domain filtering — the crawl-side gate every web-corpus recipe
  * applies before touching document bytes (C4's badwords URL rule,
  * RefinedWeb's UT1 blocklist stage): drop documents whose source URL
  * sits on a blocked domain (or any of its subdomains) or whose URL
  * contains a blocked substring.
  *
  * Pure codegen'd expressions, zero shuffle, and — like every filter
  * in this family — RE2∩Java-regex-safe so the oracle replays it:
  * host extraction is one `regexp_extract` (scheme/userinfo/port/path
  * stripped, lowercased, leading `www.` removed), domain matching is
  * an `exists` over the blocklist literal (exact host or
  * dot-boundary suffix — `evil.com` blocks `a.evil.com` but NOT
  * `notevil.com`), substring terms match against the whole lowercased
  * URL. The blocklist rides the plan as a literal array: thousands of
  * entries broadcast with the plan for free; for the multi-million-
  * entry UT1 lists, join a blocklist TABLE on the extracted
  * `registered domain` column instead (one broadcast join) — this
  * stage is the in-plan fast path.
  */
class UrlFilter(override val uid: String)
    extends Transformer with HasInputCol with GraftWritable {
  def this() = this(Identifiable.randomUID("UrlFilter"))

  final val blockedDomains = new StringArrayParam(this, "blockedDomains",
    "domains blocked together with every subdomain")
  setDefault(blockedDomains -> Array.empty[String])
  def setBlockedDomains(v: Seq[String]): this.type =
    set(blockedDomains, v.toArray)

  final val blockedTerms = new StringArrayParam(this, "blockedTerms",
    "lowercase substrings that block a URL anywhere they appear")
  setDefault(blockedTerms -> Array.empty[String])
  def setBlockedTerms(v: Seq[String]): this.type =
    set(blockedTerms, v.toArray)

  /** The UT1-scale path: a blocklist TABLE (millions of registered
    * domains — far past what should ride the plan as a literal array)
    * probed as a broadcast [[graft.core.CompactStringSet]]. Runtime
    * state, not a Param (the SemDeDup setCorpus convention): the table
    * does not persist with the stage.
    *
    * Driver-memory contract: the distinct normalized entries are
    * collected to the driver ONCE at transform time and packed —
    * entry UTF-8 bytes plus ~10 bytes/entry (a 5M-entry UT1 list is
    * ~150 MB of driver heap and broadcast payload; measured at
    * nameplate scale in SCALING.md round 14). The collect is bounded
    * by `maxTableEntries` and fails fast past it — a URL column passed
    * by mistake dies with a clear message, never a driver OOM. */
  @transient private var blockTable: Option[(DataFrame, String)] = None
  def setBlockedDomainTable(table: DataFrame,
      domainCol: String = "domain"): this.type = {
    blockTable = Some((table, domainCol)); this
  }

  /** Pre-packed alternative to [[setBlockedDomainTable]]: hand the stage
    * an already-packed [[graft.core.CompactStringSet]] (from
    * [[UrlFilter.packDomainTable]] once per pipeline, or
    * [[graft.core.CompactStringSet.load]] of a saved pack) so repeated
    * transform calls / separate jobs skip the per-call
    * distinct+collect+pack (~36 s at the 10M-entry nameplate,
    * SCALING.md round 14). Entries must be normalized the way
    * `packDomainTable` normalizes (lowercased, whitespace-stripped,
    * leading `www.` removed). Takes precedence over a blocklist table
    * when both are set. */
  @transient private var blockSet: Option[graft.core.CompactStringSet] = None
  def setBlockedDomainSet(packed: graft.core.CompactStringSet): this.type = {
    blockSet = Some(packed); this
  }

  final val maxTableEntries = new IntParam(this, "maxTableEntries",
    "fail-fast cap on distinct blocklist-table entries collected to " +
      "the driver (KNN.maxCollectRows convention)",
    ParamValidators.gt(0))
  setDefault(maxTableEntries -> 10000000)
  def setMaxTableEntries(v: Int): this.type = set(maxTableEntries, v)

  final val multiSuffixes = new StringArrayParam(this, "multiSuffixes",
    "multi-label public suffixes for registered-domain extraction on " +
      "the blocklist-table path (deployments supply the full PSL here)")
  setDefault(multiSuffixes -> UrlFilter.defaultMultiSuffixes.toArray)
  def setMultiSuffixes(v: Seq[String]): this.type =
    set(multiSuffixes, v.toArray)

  /** Domain-table semantics: `block` (default) drops matching rows —
    * the UT1 pipeline; `allow` KEEPS ONLY matching rows — the
    * curated-seed pipeline (OpenWebText-style: only documents from a
    * vetted domain list enter the corpus). Matching is identical in
    * both modes (exact host or dot-boundary subtree of an entry); in
    * allow mode rows with no parseable host are dropped — they cannot
    * be on the list. The in-plan `blockedDomains`/`blockedTerms` rules
    * stay block-semantics and apply first. */
  final val tableMode = new Param[String](this, "tableMode",
    "domain-table semantics: block (drop matches) or allow (keep " +
      "only matches)",
    ParamValidators.inArray(Array("block", "allow")))
  setDefault(tableMode -> "block")
  def setTableMode(v: String): this.type = set(tableMode, v)

  // pack-once cache for the table path: repeated transform calls on the
  // SAME table reference (and knobs) reuse the pack instead of paying
  // the distinct+collect+pack again (~25 s at the 10M-entry nameplate)
  @transient private var packCache:
    Option[(DataFrame, String, Int, graft.core.CompactStringSet)] = None

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    val df = ds.toDF()
    val base = df.filter(UrlFilter.keeps(col(getInputCol),
      $(blockedDomains).toIndexedSeq, $(blockedTerms).toIndexedSeq))
    val packed = blockSet.orElse(blockTable.map { case (t, dcol) =>
      packCache match {
        case Some((ct, cd, cm, cset))
            if (ct eq t) && cd == dcol && cm == $(maxTableEntries) => cset
        case _ =>
          val cset = UrlFilter.packDomainTable(t, dcol, $(maxTableEntries))
          packCache = Some((t, dcol, $(maxTableEntries), cset))
          cset
      }
    })
    packed match {
      case None => base
      case Some(cset) =>
        UrlFilter.filterByDomainSet(base, getInputCol, cset,
          $(multiSuffixes).toIndexedSeq, $(tableMode))
    }
  }
  override def transformSchema(schema: StructType): StructType = {
    graft.core.SchemaChecks.requireCols(schema, "inputCol" -> getInputCol)
    schema
  }
  override def copy(extra: ParamMap): UrlFilter = defaultCopy(extra)
}

object UrlFilter extends GraftReadable[UrlFilter] {

  /** Lowercased host of a URL, `www.`-stripped; empty string when the
    * URL has no parseable authority. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(url),
        "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1),
      "^www\\.", "")

  /** Multi-label public suffixes that make the registered domain three
    * labels instead of two — the high-traffic subset of the public
    * suffix list (the full PSL is a data file a deployment supplies to
    * `registeredDomain`'s second parameter; this default covers the
    * dominant ccTLD second-level registries). */
  val defaultMultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "com.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "co.in", "com.mx", "com.ar",
    "com.tr", "co.kr", "or.kr", "co.za", "com.sg", "com.hk", "com.tw",
    "co.nz", "com.my", "co.id", "com.eg", "com.sa", "co.il", "com.ua",
    "com.pl", "com.vn")

  /** Registered (pay-level) domain of a URL: the last two host labels,
    * or the last three when the two-label tail is a listed public
    * suffix — the key every per-domain operator (mixtures, upsampling,
    * caps) should group by, since grouping by raw host splits one
    * site into thousands of subdomain groups. Hosts with fewer labels
    * (bare TLDs, IPs are left as-is) pass through. */
  def registeredDomain(url: Column,
      multiSuffixes: Seq[String] = defaultMultiSuffixes): Column =
    registeredDomainOfHost(host(url), multiSuffixes)

  /** [[registeredDomain]] for an already-extracted (lowercased,
    * www-stripped) host string. */
  def registeredDomainOfHost(h: Column,
      multiSuffixes: Seq[String] = defaultMultiSuffixes): Column = {
    val two = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val three = regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(two.isin(multiSuffixes: _*) && three =!= "", three).otherwise(two)
  }

  private val TwoLabel =
    java.util.regex.Pattern.compile("([^.]+\\.[^.]+)$")
  private val ThreeLabel =
    java.util.regex.Pattern.compile("([^.]+\\.[^.]+\\.[^.]+)$")

  /** JVM replica of [[registeredDomainOfHost]] (same regexes). */
  private[text] def registeredDomainOfHostJvm(h: String,
      multiSuffixes: Set[String]): String = {
    val m2 = TwoLabel.matcher(h)
    val two = if (m2.find()) m2.group(1) else ""
    if (two.isEmpty) ""
    else if (multiSuffixes.contains(two)) {
      val m3 = ThreeLabel.matcher(h)
      val three = if (m3.find()) m3.group(1) else ""
      if (three.nonEmpty) three else two
    } else two
  }

  /** Drop every row whose URL's host equals, or is a dot-boundary
    * subdomain of, an entry in `blocklist(domainCol)` with the same
    * registered domain — real UT1 lists mix registered domains with
    * FULL hostnames (`xyz.blogspot.com`), so keying the whole match on
    * the registered domain alone would silently never match the finer
    * entries (round-13 review). Shape: the normalized entry set
    * (lowercased, ALL whitespace stripped — CRLF-saved lists carry \r —
    * www-stripped, blanks dropped, deduped) is collected and broadcast
    * ONCE (a few million strings, comparable bytes to the broadcast
    * hash table the former anti join built), and each fact row probes
    * it with its host's dot-boundary suffix chain truncated at the
    * registered domain — O(host labels) hash lookups per row, NEVER a
    * scan of a per-domain entry bucket (a hot registered domain like
    * blogspot.com concentrates 10^5+ UT1 entries; any per-bucket scan
    * is quadratic-shaped on exactly the rows that matter). The fact
    * side never moves and plans as one UDF filter, no join. A
    * registered-domain entry still blocks every subdomain; an entry
    * FINER than a registered domain blocks only its own subtree;
    * entries at or above a public suffix ('co.uk') only match hosts
    * whose registered domain IS that string — whole-suffix blocking is
    * out of scope. Rows with no parseable host are KEPT — the
    * blocklist names domains, and in-plan `blockedTerms` already
    * handle malformed-URL policy.
    *
    * The broadcast structure is a [[graft.core.CompactStringSet]]
    * (entry UTF-8 bytes + ~10 bytes/entry — several-fold under a JVM
    * `Set[String]` at UT1 scale), probed region-wise over the host's
    * UTF-8 bytes so the suffix chain allocates nothing per step ('.'
    * is ASCII, so byte scanning is UTF-8-safe). The driver collect is
    * bounded: `maxEntries + 1` rows are fetched and one more than the
    * cap fails fast with a message naming the knob — the
    * KNN.maxCollectRows convention. */
  def filterByDomainTable(df: DataFrame, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain",
      maxEntries: Int = 10000000,
      multiSuffixes: Seq[String] = defaultMultiSuffixes,
      mode: String = "block"): DataFrame =
    filterByDomainSet(df, urlCol,
      packDomainTable(blocklist, domainCol, maxEntries), multiSuffixes,
      mode)

  /** The pack half of [[filterByDomainTable]], exposed so a pipeline of
    * N jobs pays the distinct+collect+pack ONCE (then
    * [[graft.core.CompactStringSet.save]]s it, or holds it and calls
    * [[filterByDomainSet]] / `setBlockedDomainSet` per job): normalize
    * (lowercase, strip ALL whitespace — CRLF-saved lists carry \r —
    * drop leading `www.`, drop blanks), distinct, bounded collect, pack. */
  def packDomainTable(blocklist: DataFrame, domainCol: String = "domain",
      maxEntries: Int = 10000000): graft.core.CompactStringSet = {
    val e = regexp_replace(
      regexp_replace(lower(col(domainCol)), "\\s", ""), "^www\\.", "")
    // +1 saturating (maxEntries = Int.MaxValue must not overflow the
    // limit to a negative): one row past the cap proves the overflow
    val fetch = if (maxEntries == Int.MaxValue) maxEntries else maxEntries + 1
    val collected = blocklist.select(e.as("e")).filter(col("e") =!= "")
      .distinct().limit(fetch).collect()
    require(collected.length <= maxEntries,
      s"packDomainTable: blocklist '$domainCol' has more than " +
        s"$maxEntries distinct entries — is it really a domain column? " +
        "Raise maxEntries (setMaxTableEntries on the stage) if the " +
        "list is genuinely this large; budget entry bytes + ~10 B/entry " +
        "of driver heap and broadcast payload")
    graft.core.CompactStringSet(
      collected.iterator.map(_.getString(0)).toSeq)
  }

  /** The probe half of [[filterByDomainTable]] over an already-packed
    * entry set (same matching semantics — see that method's doc).
    * `multiSuffixes` is the same custom-PSL hook the rest of the
    * registered-domain API takes: under the default list an UNLISTED
    * multi-label suffix (e.g. `com.ng`) is treated as a registered
    * domain, so a blocklist entry equal to the bare suffix would block
    * the whole suffix — list it here and the probe chain stops at the
    * true three-label registered domain instead. */
  def filterByDomainSet(df: DataFrame, urlCol: String,
      packed: graft.core.CompactStringSet,
      multiSuffixes: Seq[String] = defaultMultiSuffixes,
      mode: String = "block"): DataFrame = {
    require(mode == "block" || mode == "allow",
      s"mode must be block or allow, got '$mode'")
    val bset = df.sparkSession.sparkContext.broadcast(packed)
    val sufs = multiSuffixes.toSet
    val blockedUdf = udf { h: String =>
      if (h == null || h.isEmpty) false
      else {
        val set = bset.value
        val rd = registeredDomainOfHostJvm(h, sufs)
        val hb = h.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (rd.isEmpty) set.containsRegion(hb, 0, hb.length)
        else {
          // dot-boundary suffixes of h, longest first, down to rd
          // (rd is a char-suffix of h, so its UTF-8 length bounds the
          // byte-space chain the same way)
          val rdLen = utf8Length(rd)
          var start = 0
          var hit = false
          while (!hit && hb.length - start >= rdLen) {
            if (set.containsRegion(hb, start, hb.length - start)) hit = true
            else {
              var dot = start
              while (dot < hb.length && hb(dot) != '.') dot += 1
              start = if (dot >= hb.length) hb.length + 1 else dot + 1
            }
          }
          hit
        }
      }
    }
    val hit = blockedUdf(host(col(urlCol)))
    // allow mode keeps ONLY matches (a hostless row cannot be on the
    // list, so the udf's false drops it — the curated-seed semantic)
    if (mode == "allow") df.filter(hit) else df.filter(!hit)
  }

  /** UTF-8 byte length of a string, allocation-free */
  private[text] def utf8Length(s: String): Int = {
    var n = 0; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      n += (if (cp < 0x80) 1 else if (cp < 0x800) 2
            else if (cp < 0x10000) 3 else 4)
      i += Character.charCount(cp)
    }
    n
  }

  /** The keep predicate (true = survives). */
  def keeps(url: Column, domains: Seq[String], terms: Seq[String]): Column = {
    val h = host(url)
    val domainHit =
      if (domains.isEmpty) lit(false)
      else exists(lit(domains.toArray),
        d => h === d || endswith(h, concat(lit("."), d)))
    val termHit =
      if (terms.isEmpty) lit(false)
      else exists(lit(terms.toArray), t => contains(lower(url), t))
    url.isNotNull && !domainHit && !termHit
  }
}

/** URL canonicalization for URL-level deduplication — the first dedup
  * stage of RefinedWeb (Penedo et al. 2023 §3.2: "we deduplicate URLs")
  * and the cheapest dedup a crawl pipeline has: two crawls of the same
  * page differ only in tracking decorations, fragment, host case, or a
  * trailing slash, and collapsing those costs one narrow projection.
  *
  * The canonical form, applied only to strings that carry a
  * `scheme://` prefix (anything else passes through verbatim):
  * fragment dropped; scheme and host lowercased; userinfo dropped;
  * leading `www.` dropped (the [[UrlFilter.host]] convention); the
  * scheme's default port dropped (`:80` for http, `:443` for https);
  * trailing slashes stripped from the path; tracking query parameters
  * (`trackingParams`, matched on the lowercased name) removed with the
  * remaining parameters left in order; an emptied query dropped. Path
  * case and non-default ports are preserved — paths are case-sensitive
  * and ports are routing.
  *
  * Every step is a codegen'd expression in the RE2∩Java regex subset
  * (each pattern can match at most once, so Spark's replace-all and
  * DuckDB's replace-first agree) — zero shuffle; compose with
  * [[graft.dedup.ExactDeduplicator]] on the output column for the
  * actual URL dedup, which then pays only the standard dedup shuffle
  * on the collapsed key.
  */
class UrlNormalizer(override val uid: String)
    extends Transformer with HasInputCol with GraftWritable {
  def this() = this(Identifiable.randomUID("UrlNormalizer"))

  final val outputCol = new Param[String](this, "outputCol",
    "normalized-URL output column")
  setDefault(outputCol -> "url_norm")
  def setOutputCol(v: String): this.type = set(outputCol, v)

  final val trackingParams = new StringArrayParam(this, "trackingParams",
    "query parameter names (lowercase) dropped during normalization")
  setDefault(trackingParams -> Array("utm_source", "utm_medium",
    "utm_campaign", "utm_term", "utm_content", "utm_id", "gclid",
    "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid", "ref"))
  def setTrackingParams(v: Seq[String]): this.type =
    set(trackingParams, v.toArray)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn($(outputCol),
      UrlNormalizer.normalize(col(getInputCol),
        $(trackingParams).toIndexedSeq))

  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField($(outputCol), StringType))
  override def copy(extra: ParamMap): UrlNormalizer = defaultCopy(extra)
}

object UrlNormalizer extends GraftReadable[UrlNormalizer] {

  /** The canonicalization chain as a single column expression. */
  def normalize(url: Column, trackers: Seq[String]): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_extract(rest, "^([^/?]*)", 1)
    val tail = regexp_replace(rest, "^[^/?]*", "")
    val h0 = lower(regexp_replace(hostport, "^[^@]*@", ""))
    val h1 = regexp_replace(h0, "^www\\.", "")
    val h2 = when(scheme === "http", regexp_replace(h1, ":80$", ""))
      .when(scheme === "https", regexp_replace(h1, ":443$", ""))
      .otherwise(h1)
    val path = regexp_replace(regexp_extract(tail, "^([^?]*)", 1),
      "/+$", "")
    val qs = regexp_replace(tail, "^[^?]*", "")
    val kept = filter(split(qs.substr(lit(2), length(qs)), "&"),
      p => !lower(regexp_extract(p, "^([^=]*)", 1))
        .isin(trackers.map(t => t: Any): _*))
    val qNorm = when(length(qs) <= 1, lit(""))
      .when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(url.isNull, lit(null).cast(StringType))
      .when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), h2, path, qNorm))
  }
}
