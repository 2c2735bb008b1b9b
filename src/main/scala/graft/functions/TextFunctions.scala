package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (north-star ★ extensions over the
  * reference's string handling, SURVEY §2.11): tokenization, quality
  * scoring, language-ID heuristic, fingerprinting. All pure Column
  * expressions (codegen'd) — no UDFs, per the engine policy
  * (SURVEY §7.4).
  *
  * Every function has a documented DuckDB-oracle SQL spelling in
  * TextQueries; keep them in sync.
  */
object TextFunctions {
  private[graft] type CatalystExpr =
    org.apache.spark.sql.catalyst.expressions.Expression
  private def shimColumn(e: CatalystExpr): Column =
    org.apache.spark.sql.GraftSqlShim.column(e)
  private def shimExpression(c: Column): CatalystExpr =
    org.apache.spark.sql.GraftSqlShim.expression(c)

  /** Whitespace tokenization. The documents corpus is single-space
    * joined (FIXTURES.md), so a literal-space split matches the oracle
    * (`string_split(text, ' ')`) exactly. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Character class of the spaceless scripts the tokenizer pipeline
    * must segment DETERMINISTICALLY before any whitespace split: the
    * q189 CJK unified-ideographs range plus the Thai block — scripts
    * that write without word spaces, so a whitespace tokenizer sees
    * one giant pseudo-word per run and every word-grained statistic
    * (BPE training, fertility, n_words) degenerates. Literal BMP
    * endpoints, identical in Java regex and RE2. */
  val spacelessClass: String = "[一-鿿ก-๛]"

  /** Deterministic segmentation for spaceless scripts: every
    * contiguous CJK/Thai run becomes its own whitespace-delimited
    * word (boundaries at script transitions), surrounding whitespace
    * re-collapsed. Runs stay INTACT — the BPE layer then splits them
    * per-codepoint as its initial tokens and learns merges WITHIN the
    * run, which is what makes fertility on these scripts a measured
    * number instead of a vacuous 1-token-per-pseudo-word. A pure
    * regex ladder (no UDF, codegen-friendly) with a byte-identical
    * DuckDB twin ([[sqlSegmentText]]). */
  def segmentText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, s"($spacelessClass+)", " $1 "),
      " +", " "))

  /** DuckDB spelling of [[segmentText]] — same two-stage ladder
    * (RE2 replacement backrefs are `\1`; 'g' replaces all). */
  def sqlSegmentText(e: String): String =
    s"trim(regexp_replace(regexp_replace($e, " +
      s"'($spacelessClass+)', ' \\1 ', 'g'), ' +', ' ', 'g'))"

  /** Tokens matched against a fixed vocabulary, as a count. */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(vocab.map(lit(_)): _*))).cast("long")

  /** English-ish stopword list used by the quality score and the
    * stopword-ratio feature. Fixed and tiny by design: the score is a
    * heuristic, not a model. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
      "for", "with", "as", "by", "at")

  def stopwordRatio(text: Column): Column =
    vocabHits(text, stopwords).cast("double") / tokenCount(text).cast("double")

  /** Mean token length (separator-free character mass / token count) —
    * cheap shape feature used by quality scoring. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") /
      tokenCount(text).cast("double")

  /** Composite quality score in [0,1]: length saturation, stopword
    * presence, and token-shape plausibility. Deterministic per-row
    * double arithmetic (engine-portable). Weights are part of the
    * function's contract — change them and the oracle SQL together. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenSat = least(nTok / lit(64.0), lit(1.0))
    val stopSat = least(stopwordRatio(text) * lit(10.0), lit(1.0))
    val shape = least(avgTokenLen(text) / lit(8.0), lit(1.0))
    lit(0.5) * lenSat + lit(0.3) * stopSat + lit(0.2) * shape
  }

  /** Per-language marker vocabularies for the n-gram-free language-ID
    * heuristic (SURVEY north star). Order matters: it is the
    * deterministic tie-break priority. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "que", "y"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai"))

  /** Language-ID: argmax of marker-vocabulary hit counts, first-listed
    * language wins ties, 'und' (undetermined) when nothing hits. */
  def langGuess(text: Column): Column = {
    val hits = langMarkers.map { case (l, vocab) => l -> vocabHits(text, vocab) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((l, h), acc) =>
      when(h === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Content fingerprint: md5 of the exact text — the engine's exact-dup
    * key (md5 is engine-portable, unlike xxhash64). */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonical text form for dedup/fingerprinting across encodings
    * (★): Unicode NFC (+ optional accent strip), lowercase, whitespace
    * collapse, trim — so "Élan  Café" and "Élan Café "
    * normalize to one string. The Unicode step is the codegen'd
    * `plans.UnicodeNormalize`; the rest is built-in Column functions.
    * Apply BEFORE [[fingerprint]]/shingling: canonical equality is
    * what makes exact dedup correct on multilingual corpora. */
  def normalizeText(text: Column, stripAccents: Boolean = false): Column =
    trim(regexp_replace(
      lower(graft.plans.UnicodeNormalize(text, stripAccents)), "\\s+", " "))

  /** Sentiment lexicons — the engine's eponymous capability (the
    * reference repo is Sentiment-Analysis-Data-Engineering; its README
    * frames the warehouse as stock analysis `README.md:4`). A
    * broadcast-lexicon hit count inside a Column expression — no UDF,
    * per SURVEY §2.11's mechanism table. */
  val positiveWords: Seq[String] =
    Seq("good", "great", "fast", "win", "up", "gain", "strong", "new",
      "best", "top", "growth", "profit", "merge", "stream")
  val negativeWords: Seq[String] =
    Seq("bad", "slow", "loss", "down", "drop", "weak", "error", "fail",
      "risk", "wrong", "crash", "spill")

  /** Net sentiment in [-1, 1]: (pos − neg) / tokens. Per-row double
    * division — engine-portable. */
  def sentimentScore(text: Column): Column =
    (vocabHits(text, positiveWords) - vocabHits(text, negativeWords))
      .cast("double") / tokenCount(text).cast("double")

  /** Ternary sentiment label with a ±0.01 neutral band. */
  def sentimentLabel(text: Column): Column = {
    val s = sentimentScore(text)
    when(s > 0.01, "positive").when(s < -0.01, "negative").otherwise("neutral")
  }

  /** BPE-ish regex tokenization (north-star "whitespace + a BPE-ish
    * regex" token counting): alpha runs, digit runs, and single
    * non-alnum marks each count as one token — the shape a byte-pair
    * vocabulary degenerates to without merges. Pattern kept to the
    * RE2 ∩ Java-regex common subset so the DuckDB oracle matches. */
  val bpeTokenPattern: String = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast("long")

  /** Rolling (Rabin-Karp polynomial) fingerprint over the token
    * stream — an order-sensitive document signature: equal token
    * sequences collide, any reorder/edit diverges. The fold is
    * `acc ← (acc·31 + h(token)) mod (2³¹−1)` with h =
    * `Scalars.portableHash64` (md5-derived): acc < 2³¹ and h < 2⁶⁰
    * keep every intermediate below 2⁶¹, so the fold is ANSI-overflow-
    * safe with no UDF — and, unlike the xxhash64 rotate-xor form it
    * replaces, every term is spellable in DuckDB (`list_reduce` +
    * hex-cast md5), making the fingerprint oracle-verifiable. */
  val rollingMod = 2147483647L // 2^31 - 1 (Mersenne prime)
  val rollingBase = 31L

  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * lit(rollingBase) +
        graft.functions.Scalars.portableHash64(t)) % lit(rollingMod))

  /** DuckDB spelling of rollingFingerprint: hash tokens, prepend the
    * zero seed (DuckDB's list_reduce has no initial-value parameter),
    * fold the same recurrence. */
  def sqlRollingFingerprint(textExpr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($textExpr, ' '),
       |      t -> ${graft.functions.Scalars.sqlPortableHash64("t")})),
       |  (a, b) -> (a * $rollingBase + b) % $rollingMod)""".stripMargin

  /** Repetition features (Gopher-style quality filters, Rae et al.
    * 2021 §A1.1 — public): boilerplate and degenerate text show up as
    * a low distinct-token ratio, a dominant single token, or repeated
    * n-grams. All three below are pure per-row Column expressions —
    * no shuffle, no UDF — so the filter runs at scan speed on 100 TB.
    *
    * Ratios divide two exact integers in double precision, which both
    * engines round identically, so the features are hash-verifiable
    * without decimal quantization. */
  def distinctTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") /
      size(tokens(text)).cast("double")

  /** Highest single-token multiplicity, via the max equal-run in the
    * SORTED token array — O(n log n) per row where the per-distinct-
    * token `filter` scan the oracle uses is O(n·distinct); same value
    * (max run of a sorted multiset = max multiplicity). */
  def maxTokenMultiplicity(text: Column): Column = {
    val sorted = sort_array(tokens(text))
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"))
    aggregate(sorted, zero,
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  def topTokenRatio(text: Column): Column =
    maxTokenMultiplicity(text).cast("double") /
      size(tokens(text)).cast("double")

  /** Shannon entropy (nats) of the document's unigram distribution —
    * the perplexity-proxy quality feature: degenerate/repetitive text
    * scores low, natural text near ln(distinct). Computed in the SAME
    * sorted-run fold as [[maxTokenMultiplicity]] (each run's count is
    * final when the value changes), so it stays O(n log n) per row
    * where the oracle's per-distinct-token scan is O(n·d). Rounded to
    * 6 decimals (the cosine rule): ln is within 1 ulp on both engines
    * and the ~d-term sum accumulates ≪ 1e-6 of drift, so the rounded
    * value is engine-identical. */
  def tokenEntropy(text: Column): Column =
    // the token array is bound ONCE: `n` sits inside the fold lambda
    // (term() divides by it at every run boundary), and an unbound
    // spelling re-splits the document per element — the q150 lesson
    bound(tokens(text)) { toks =>
      val n = size(toks).cast("double")
      def term(run: Column): Column =
        when(run > 0L,
          (run.cast("double") / n) * log(run.cast("double") / n))
          .otherwise(lit(0.0))
      val sorted = sort_array(toks)
      val zero = struct(lit(null).cast("string").as("prev"),
        lit(0L).as("run"), lit(0.0).as("acc"))
      val summed = aggregate(sorted, zero,
        (acc, x) => {
          val sameRun = acc.getField("prev") <=> x
          struct(x.as("prev"),
            when(sameRun, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
            when(sameRun, acc.getField("acc"))
              .otherwise(acc.getField("acc") + term(acc.getField("run")))
              .as("acc"))
        },
        acc => acc.getField("acc") + term(acc.getField("run")))
      // 0.0 - x (not -x): a zero sum must come out +0.0, never -0.0 —
      // the two hash differently even though they compare equal
      round(lit(0.0) - summed, 6)
    }

  /** PII scrubbing (training-data pipeline ★ — the redaction pass a
    * corpus runs before anything else sees it): email-shaped tokens
    * and long digit runs are replaced with typed placeholder marks.
    * Patterns stay in the RE2 ∩ Java-regex common subset (the
    * [[bpeTokenPattern]] rule) so the DuckDB oracle applies the exact
    * same automaton. Pure per-row Column — scan-speed, no shuffle. */
  val piiEmailPattern: String = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
  val piiNumberPattern: String = "[0-9]{8,}"

  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(piiEmailPattern), lit("<EMAIL>")),
      lit(piiNumberPattern), lit("<NUM>"))

  /** Redaction count, composed the same way as [[piiRedact]]: digit
    * runs are counted AFTER email replacement, so a digit run inside
    * an email is one redaction, not two. */
  def piiCount(text: Column): Column = {
    val deEmailed = regexp_replace(text, lit(piiEmailPattern), lit("<EMAIL>"))
    (size(regexp_extract_all(text, lit(piiEmailPattern), lit(0))) +
      size(regexp_extract_all(deEmailed, lit(piiNumberPattern), lit(0))))
      .cast("long")
  }

  /** Payment-card candidate: a 13–19 digit run ([[piiNumberPattern]]
    * finds ANY long digit run; the card tier validates). */
  val cardCandidatePattern: String = "[0-9]{13,19}"

  /** Luhn checksum (ISO/IEC 7812) over a digit string: from the
    * RIGHTMOST digit, double every second digit (−9 when > 9), sum,
    * valid iff ≡ 0 (mod 10). The precision gate that separates a
    * payment card from an order id — redacting every long digit run
    * (q116's `<NUM>` tier) is recall-safe but destroys identifiers a
    * model should keep; the checksum keeps false positives out of
    * the card tier. Integer-only, so the SQL twin matches exactly.
    * `s` must be all digits (the candidate pattern guarantees it);
    * inputs are ≤ 19 chars so the per-element length() re-evaluation
    * inside the lambda is noise, not the §2.16 O(n²) trap. */
  def luhnValid(s: Column): Column = {
    val n = length(s)
    val contrib = transform(sequence(lit(1), n), i => {
      val d = s.substr(i, lit(1)).cast("int")
      val dbl = d * 2
      when(((n - i) % 2) === 1,
        when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
    })
    aggregate(contrib, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** DuckDB spelling of [[luhnValid]]; `e` must be a simple
    * expression (it is referenced several times). */
  def sqlLuhnValid(e: String): String =
    s"(list_reduce(list_prepend(0, list_transform(range(1, len($e) + 1), " +
      s"i -> CASE WHEN (len($e) - i) % 2 = 1 THEN " +
      s"CASE WHEN CAST($e[i] AS INTEGER) * 2 > 9 " +
      s"THEN CAST($e[i] AS INTEGER) * 2 - 9 " +
      s"ELSE CAST($e[i] AS INTEGER) * 2 END " +
      s"ELSE CAST($e[i] AS INTEGER) END)), (acc, x) -> acc + x) % 10 = 0)"

  /** Checksum-gated card redaction: every Luhn-VALID 13–19 digit run
    * is replaced with `<CARD>`; invalid runs (order ids, timestamps)
    * survive. The valid candidates fold over the text in SORTED order
    * so the replacement sequence — and therefore the output on
    * pathological overlapping inputs — is deterministic and engine-
    * independent. Pure per-row Column work: no shuffle, no UDF. */
  def cardRedact(text: Column): Column = {
    val cands = regexp_extract_all(text, lit(cardCandidatePattern), lit(0))
    val valid = filter(cands, x => luhnValid(x))
    aggregate(array_sort(valid), text,
      (acc, c) => replace(acc, c, lit("<CARD>")))
  }

  /** Markup stripping (training-data pipeline ★ — the pass every web
    * corpus runs before any text stage sees it): script and style
    * blocks and comments drop WITH their content, remaining tags
    * (incl. `<!DOCTYPE>`) become a space so adjacent text doesn't
    * fuse, the five ubiquitous entities decode (`&amp;` LAST, the
    * standard order — decoding it first would re-expose entity
    * prefixes in text like `&amp;lt;` and double-decode), and
    * whitespace collapses to single spaces. Patterns stay in the
    * RE2 ∩ Java-regex common subset (the [[piiRedact]] rule:
    * no backreferences, case-folding spelled `(?i)` inline) so the
    * DuckDB oracle applies the exact same automaton. Pure per-row
    * Column — scan speed, no shuffle. */
  val scriptBlockPattern: String = "(?is)<script[^>]*>.*?</script>"
  val styleBlockPattern: String = "(?is)<style[^>]*>.*?</style>"
  val htmlCommentPattern: String = "(?s)<!--.*?-->"
  val htmlTagPattern: String = "<[!/]?[a-zA-Z][^>]*>"
  private val entityDecodeOrder: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** The ladder as ONE Catalyst tree, shared verbatim by the Column
    * API below and the SQL-surface registration (GraftExtensions
    * `strip_markup`) — the two entry points cannot diverge. */
  private[graft] def stripMarkupExpr(child: CatalystExpr): CatalystExpr = {
    import org.apache.spark.sql.catalyst.expressions._
    // blocks and tags both become a SPACE, never the empty string —
    // "end<script>…</script>Start" must not fuse into "endStart"
    val s = Cast(child, org.apache.spark.sql.types.StringType)
    val noBlocks = Seq(scriptBlockPattern, styleBlockPattern,
        htmlCommentPattern)
      .foldLeft(s: CatalystExpr)((e, p) =>
        RegExpReplace(e, Literal(p), Literal(" ")))
    val noTags = RegExpReplace(noBlocks, Literal(htmlTagPattern),
      Literal(" "))
    val decoded = entityDecodeOrder.foldLeft(noTags: CatalystExpr) {
      case (e, (ent, r)) => StringReplace(e, Literal(ent), Literal(r))
    }
    StringTrim(RegExpReplace(decoded, Literal("\\s+"), Literal(" ")))
  }

  def stripMarkup(text: Column): Column =
    shimColumn(stripMarkupExpr(shimExpression(text)))

  /** DuckDB spelling of [[stripMarkup]], generated from the SAME
    * pattern constants and entity order so the two sides cannot
    * drift. DuckDB's regexp_replace needs the explicit 'g' option
    * (Java's replaces all matches by default); dotall/case flags ride
    * inline in the shared patterns. */
  def sqlStripMarkup(textExpr: String): String = {
    def q(s: String): String = "'" + s.replace("'", "''") + "'"
    val noBlocks = Seq(scriptBlockPattern, styleBlockPattern,
        htmlCommentPattern)
      .foldLeft(textExpr)((e, p) => s"regexp_replace($e, ${q(p)}, ' ', 'g')")
    val noTags = s"regexp_replace($noBlocks, ${q(htmlTagPattern)}, ' ', 'g')"
    val decoded = entityDecodeOrder.foldLeft(noTags) {
      case (e, (ent, r)) => s"replace($e, ${q(ent)}, ${q(r)})"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** URL canonicalization (training-data pipeline ★ — the pass ahead
    * of URL-keyed dedup and per-domain quota caps: crawl frontiers
    * hand you the same page as http/https, with/without `www.`, with
    * tracking parameters, fragments, default ports, and trailing
    * slashes — six spellings, one document). The ladder, in order:
    * lowercase scheme+host (path case is significant, so only up to
    * the first `/`), strip the fragment, strip default ports
    * (`:80`/`:443` — any scheme: stripping :443 from an http URL
    * changes a URL that was already broken), drop `www.`, drop
    * tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref` — the
    * documented subset; extend the list, not the regex style), tidy
    * the query separators that deletion leaves behind, and strip one
    * trailing slash from a non-root path. RE2 ∩ Java common subset
    * throughout (the [[piiRedact]] rule) with the DuckDB twin
    * generated from the SAME constants. */
  val urlTrackingParams: Seq[String] = Seq("utm_[a-z]+", "fbclid",
    "gclid", "ref")
  private val urlTrackingAlt: String = urlTrackingParams.mkString("|")
  private val urlLadder: Seq[(String, String)] = Seq(
    "#.*$" -> "",                                     // fragment
    "^([a-z]+://[^/]*):(80|443)(/|\\?|$)" -> "$1$3",  // default ports
    "^([a-z]+://)www\\." -> "$1",                     // www.
    // tracking params, three positions: non-leading ("&utm_x=…"),
    // leading with a surviving successor ("?utm_x=…&a=1" → "?a=1" —
    // a bare deletion would weld "&a=1" onto the path), sole
    (s"&($urlTrackingAlt)=[^&#]*" -> ""),
    (s"\\?($urlTrackingAlt)=[^&#]*&" -> "?"),
    (s"\\?($urlTrackingAlt)=[^&#]*$$" -> ""),
    "^([a-z]+://[^/?]+(?:/[^/?]+)+)/$" -> "$1")       // trailing slash

  /** One shared Catalyst tree for the Column API and the SQL surface
    * (`canonicalize_url`), like [[stripMarkupExpr]]. */
  private[graft] def canonicalizeUrlExpr(child: CatalystExpr)
      : CatalystExpr = {
    import org.apache.spark.sql.catalyst.expressions._
    // lowercase ONLY scheme+host: split at the first slash after the
    // authority, lowercase the left, keep the path's case
    val s = Cast(child, org.apache.spark.sql.types.StringType)
    val schemeHost = Lower(RegExpExtract(s,
      Literal("^([A-Za-z]+://[^/?#]*)"), Literal(1)))
    val rest = RegExpReplace(s, Literal("^[A-Za-z]+://[^/?#]*"),
      Literal(""))
    val lowered = Concat(Seq(schemeHost, rest))
    urlLadder.foldLeft(lowered: CatalystExpr) {
      case (e, (p, r)) => RegExpReplace(e, Literal(p), Literal(r))
    }
  }

  def canonicalizeUrl(url: Column): Column =
    shimColumn(canonicalizeUrlExpr(shimExpression(url)))

  /** DuckDB spelling of [[canonicalizeUrl]], generated from the same
    * ladder. DuckDB's regexp_replace uses RE2 `\\1` backreference
    * syntax in replacements where Java uses `$1` — the one divergence,
    * handled here so the pattern constants stay shared. */
  def sqlCanonicalizeUrl(urlExpr: String): String = {
    def q(s: String): String = "'" + s.replace("'", "''") + "'"
    val lowered =
      s"lower(regexp_extract($urlExpr, '^([A-Za-z]+://[^/?#]*)', 1)) || " +
        s"regexp_replace($urlExpr, '^[A-Za-z]+://[^/?#]*', '')"
    urlLadder.foldLeft(s"($lowered)") { case (e, (p, r)) =>
      s"regexp_replace($e, ${q(p)}, ${q(r.replace("$", "\\"))}, 'g')"
    }
  }

  /** URL harvesting (training-data pipeline ★ — the extraction pass
    * feeding crawl frontiers, link-graph features, and URL-keyed
    * dedup: raw pages carry their outlinks inline, and every
    * downstream URL operator — [[canonicalizeUrl]], per-domain
    * quotas, domain PageRank — starts from this list). The pattern
    * stops at whitespace (`\s`, not just the literal space —
    * extraction runs on RAW pages, before any whitespace collapse,
    * so tabs/newlines terminate an URL too), quotes, and angle
    * brackets so an URL lifted from an `href="…"` attribute or a `<`
    * that closes a tag never drags markup along; `(?i)` accepts
    * shouting crawlers (`HTTP://…`). RE2 ∩ Java common subset (the
    * [[piiRedact]] rule) with the DuckDB twin generated from the
    * same constant. */
  val urlPattern: String = "(?i)https?://[^\\s<>\"']+"

  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** DuckDB spelling of [[extractUrls]] (list of full matches). */
  def sqlExtractUrls(textExpr: String): String =
    s"regexp_extract_all($textExpr, '${urlPattern.replace("'", "''")}')"

  /** HOST component of an (already canonicalized) URL — the key for
    * per-domain quotas and the node id of the domain link graph. The
    * host, not the authority: userinfo (`user:pass@`) and an explicit
    * port are stripped — a site must not evade a per-domain quota or
    * split its PageRank node by varying `user@` / `:8080` spellings
    * of the same domain. */
  val urlHostPattern: String = "^[a-z]+://(?:[^/?#@]*@)?([^/?#:]+)"

  def urlHost(url: Column): Column =
    regexp_extract(url, urlHostPattern, 1)

  def sqlUrlHost(urlExpr: String): String =
    s"regexp_extract($urlExpr, '$urlHostPattern', 1)"

  // --- Gopher-style heuristic rule bank (training-data pipeline ★) --
  // The published per-document filter rules (Rae et al. 2021,
  // "Scaling Language Models: … Gopher", table A1) adapted to this
  // corpus's single-line token-stream shape: word-count bounds, mean
  // word length band, symbol-token ratio, alphabetic-token ratio,
  // minimum stopword evidence, and repeated-bigram mass (the
  // line-level rules don't apply to a corpus with no line structure —
  // the repetition rule carries their intent). Each rule is an
  // independent boolean so an audit can count failures per rule; the
  // keep decision is their conjunction. Thresholds are constants of
  // the contract, shared verbatim by the Column side and the
  // generated DuckDB SQL.
  val ruleMinTokens: Long = 8L
  val ruleMaxTokens: Long = 100000L
  val ruleMeanLenLo: Double = 2.0
  val ruleMeanLenHi: Double = 10.0
  val ruleMaxSymbolRatio: Double = 0.1
  val ruleMinAlphaRatio: Double = 0.8
  val ruleMinStopHits: Long = 2L
  val ruleMaxDupBigramRatio: Double = 0.3

  /** Tokens containing any non-alphanumeric character (`##`, `…`,
    * bare punctuation) as a fraction of all tokens. */
  val symbolTokenPattern: String = "[^a-zA-Z0-9]"
  /** Tokens containing at least one letter, as a fraction of all
    * tokens (Gopher's 80%-alphabetic rule). */
  val alphaTokenPattern: String = "[a-zA-Z]"

  private def sqlTokenRatio(textExpr: String, pattern: String): String =
    s"CAST(len(list_filter(string_split($textExpr, ' '), " +
      s"t -> regexp_matches(t, '$pattern'))) AS DOUBLE) / " +
      s"CAST(len(string_split($textExpr, ' ')) AS DOUBLE)"

  /** All six rules fused into one struct over a single [[bound]]
    * token array: one split, one bigram build, three filter passes
    * per row. The per-rule accessors below extract fields of THIS
    * struct, so a projection selecting several rules shares one
    * evaluation (projection-level CSE) instead of re-deriving the
    * token array per rule. */
  private def rulesStruct(text: Column): Column =
    bound(tokens(text)) { ts =>
      val nTok = size(ts).cast("long")
      val meanLen = (length(text) - (nTok - lit(1L))).cast("double") /
        nTok.cast("double")
      def ratio(pattern: String): Column =
        size(filter(ts, t => t.rlike(pattern))).cast("double") /
          nTok.cast("double")
      val stops =
        size(filter(ts, t => t.isin(stopwords.map(lit(_)): _*))).cast("long")
      val rep = bound(
        when(size(ts) >= 2,
          transform(sequence(lit(1), size(ts) - 1),
            i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
          .otherwise(array().cast("array<string>"))) { bi =>
        // one-token docs have no bigrams (NULL ratio): vacuously clean
        coalesce(
          when(size(bi) >= 1,
            (size(bi) - size(array_distinct(bi))).cast("double") /
              size(bi).cast("double"))
            .otherwise(lit(null).cast("double")) <= ruleMaxDupBigramRatio,
          lit(true))
      }
      struct(
        (nTok >= ruleMinTokens && nTok <= ruleMaxTokens)
          .as("rule_word_count"),
        (meanLen >= ruleMeanLenLo && meanLen <= ruleMeanLenHi)
          .as("rule_mean_word_len"),
        (ratio(symbolTokenPattern) <= ruleMaxSymbolRatio)
          .as("rule_symbol_ratio"),
        (ratio(alphaTokenPattern) >= ruleMinAlphaRatio)
          .as("rule_alpha_ratio"),
        (stops >= ruleMinStopHits).as("rule_stopwords"),
        rep.as("rule_repetition"))
    }

  private val ruleNames: Seq[String] = Seq("rule_word_count",
    "rule_mean_word_len", "rule_symbol_ratio", "rule_alpha_ratio",
    "rule_stopwords", "rule_repetition")

  /** The six rules as named boolean columns, in audit order — field
    * extractions of the fused [[rulesStruct]]. */
  def heuristicRules(text: Column): Seq[(String, Column)] = {
    val rs = rulesStruct(text)
    ruleNames.map(n => n -> rs.getField(n))
  }

  /** Conjunction of [[heuristicRules]] — the keep decision (one
    * struct evaluation, six field tests). */
  def heuristicKeep(text: Column): Column = {
    val rs = rulesStruct(text)
    ruleNames.map(rs.getField).reduce(_ && _)
  }

  /** Catalyst-tree entry point for the SQL surface (`extract_urls` in
    * GraftExtensions) — a resolved tree over the child, the
    * [[stripMarkupExpr]] discipline (a Column round-trip through the
    * shim would hand the registry an unresolved function node, which
    * the analyzer never revisits on the SQL path). Shares
    * [[urlPattern]] with the Column spelling; SqlSurfaceSpec pins the
    * two surfaces equal. */
  private[graft] def extractUrlsExpr(child: CatalystExpr): CatalystExpr = {
    import org.apache.spark.sql.catalyst.expressions._
    RegExpExtractAll(Cast(child, org.apache.spark.sql.types.StringType),
      Literal(urlPattern), Literal(0))
  }

  /** DuckDB spellings of [[heuristicRules]], generated from the same
    * thresholds and patterns (same names, same order). */
  def sqlHeuristicRules(textExpr: String): Seq[(String, String)] = {
    val nTok = s"CAST(len(string_split($textExpr, ' ')) AS BIGINT)"
    val meanLen =
      s"(CAST(length($textExpr) AS DOUBLE) - (CAST($nTok AS DOUBLE) - 1))" +
        s" / CAST($nTok AS DOUBLE)"
    val stopHits =
      s"CAST(len(list_filter(string_split($textExpr, ' '), t -> t IN (${
        stopwords.map(s => s"'$s'").mkString(", ")}))) AS BIGINT)"
    Seq(
      "rule_word_count" ->
        s"($nTok >= $ruleMinTokens AND $nTok <= $ruleMaxTokens)",
      "rule_mean_word_len" ->
        s"($meanLen >= $ruleMeanLenLo AND $meanLen <= $ruleMeanLenHi)",
      "rule_symbol_ratio" ->
        s"(${sqlTokenRatio(textExpr, symbolTokenPattern)} <= $ruleMaxSymbolRatio)",
      "rule_alpha_ratio" ->
        s"(${sqlTokenRatio(textExpr, alphaTokenPattern)} >= $ruleMinAlphaRatio)",
      "rule_stopwords" -> s"($stopHits >= $ruleMinStopHits)",
      "rule_repetition" ->
        s"COALESCE(${sqlDupBigramRatio(textExpr)} <= $ruleMaxDupBigramRatio, TRUE)")
  }

  /** Evaluate `f` over `arr` bound ONCE as a lambda variable. Inside
    * higher-order-function lambda BODIES Catalyst performs no common-
    * subexpression elimination, so an `element_at(split(text), i)`
    * bigram build re-splits the document for every element — O(n²)
    * splits per row (q150's gate measured ~2 ms/row, 9.4 of its
    * 10.8 s at sf0.1, from exactly this). A HOF's ARGUMENT, by
    * contrast, is evaluated once — so wrapping the array as a
    * 1-element-array transform turns it into a bound lambda argument
    * that inner lambdas capture. */
  private[graft] def bound(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), a => f(a)), 1)

  /** Adjacent word bigrams; empty for one-token docs (mirrors the
    * shingle contract in Dedup.shinglePositions). element_at +
    * concat_ws, not slice + array_join — the slice allocates an array
    * per bigram and measured 3x slower on the explode (the
    * Dedup.shingleAt lesson). The token array is [[bound]] so the
    * per-bigram element_at lambdas index ONE split, not one per
    * element. */
  def wordBigrams(text: Column): Column =
    bound(tokens(text)) { toks =>
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>"))
    }

  /** DuckDB spelling of [[dupBigramRatio]] (self-contained — inlines
    * the token split; q112's CTE spelling is the same arithmetic).
    * The explicit CASE mirrors the Column side's NULL for docs with
    * no bigrams (q112 divides 0/0 instead, which this corpus never
    * exercises but handcrafted spec inputs do). */
  def sqlDupBigramRatio(textExpr: String): String = {
    val toks = s"string_split($textExpr, ' ')"
    s"(CASE WHEN len($toks) >= 2 THEN " +
      s"CAST(len($toks) - 1 - len(list_distinct(list_transform(" +
      s"range(1, len($toks)), i -> array_to_string(($toks)[i:i+1], ' '))))" +
      s" AS DOUBLE) / CAST(len($toks) - 1 AS DOUBLE) ELSE NULL END)"
  }

  /** Fraction of adjacent bigrams that are repeats of an earlier
    * bigram in the same document; NULL when the doc has no bigrams.
    * The bigram array is [[bound]] so its three size/distinct
    * consumers share ONE build. */
  def dupBigramRatio(text: Column): Column =
    bound(wordBigrams(text)) { bi =>
      when(size(bi) >= 1,
        (size(bi) - size(array_distinct(bi))).cast("double") /
          size(bi).cast("double"))
        .otherwise(lit(null).cast("double"))
    }

  /** Mojibake repair ladder (ftfy-lite, curation ★): the common
    * UTF-8-decoded-as-Windows-1252 sequences, ordered TRIPLES (the
    * E2-80-xx smart punctuation, whose mangled form starts with â)
    * BEFORE the Ã-digraphs — so a mangled ’ is repaired as a unit
    * before the digraph pass could misread its leading byte pair.
    * Both engines replay the SAME ladder generated from this one
    * constant (the vocabulary-constant discipline). */
  val mojibakeMap: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€œ" -> "“", "â€“" -> "–", "â€”" -> "—",
    "â€¦" -> "…",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã±" -> "ñ", "Ã§" -> "ç", "Ã¤" -> "ä", "Ã¶" -> "ö", "Ã¼" -> "ü",
    "Ã¯" -> "ï", "Ãª" -> "ê", "Ã«" -> "ë", "Ã¢" -> "â")

  /** C0/DEL control characters (tab/newline excluded — they are
    * legitimate whitespace) — identical character-class syntax in
    * Java regex and RE2. */
  val controlCharClass: String = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Repair `text`: apply the mojibake ladder, drop U+FFFD
    * replacement characters, strip C0/DEL controls. Pure per-row
    * Column expression — scan speed, no shuffle. */
  def fixEncoding(text: Column): Column = {
    val laddered = mojibakeMap.foldLeft(text) {
      case (acc, (bad, good)) => replace(acc, lit(bad), lit(good))
    }
    regexp_replace(replace(laddered, lit("�"), lit("")),
      controlCharClass, "")
  }

  /** Count of U+FFFD replacement characters in `text` (each is one
    * irrecoverably-lost span — the signal curation thresholds on). */
  def replacementCharCount(text: Column): Column =
    (length(text) - length(replace(text, lit("�"), lit(""))))
      .cast("long")

  /** DuckDB spelling of [[fixEncoding]]. */
  def sqlFixEncoding(textExpr: String): String = {
    val laddered = mojibakeMap.foldLeft(textExpr) {
      case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')"
    }
    s"regexp_replace(replace($laddered, chr(65533), ''), " +
      s"'$controlCharClass', '', 'g')"
  }

  /** DuckDB spelling of [[replacementCharCount]]. */
  def sqlReplacementCharCount(textExpr: String): String =
    s"CAST(length($textExpr) - " +
      s"length(replace($textExpr, chr(65533), '')) AS BIGINT)"
}
