package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting, and the
  * shingle/hash primitives shared by the dedup operators. All pure Column
  * expressions (codegen'd, no UDFs), all engine-portable: the hash
  * primitive is md5-based so the DuckDB oracle can reproduce every value
  * bit-for-bit.
  *
  * ==Null-text contract==
  * Every derived-text operator treats NULL text as EMPTY text, never as
  * null-propagating: [[tokens]] → `[]`, [[tokenCount]] → 0,
  * [[qualityScore]] → 0.0, [[wordShingles]] → `[""]` (the empty-text
  * singleton shingle), [[normText]]'s consumers see `""`. This is
  * deliberate — the non-nullable roots are what keep the optimizer from
  * inferring `isnotnull(<pipeline>)` predicates that pushdown would
  * inline into full per-row recomputes (round-9 plan census). The
  * consequences for external data: a null-text document flows THROUGH
  * quality/dedup pipelines as an empty document (quality 0.0 drops it in
  * any gated funnel; in a raw near-dup pass it can bucket-match other
  * empty/null docs via the `""` shingle). Ingestion that wants nulls
  * rejected must filter `isnotnull(text)` explicitly at the source scan.
  * TextFnsSpec ("null-text contract") pins these semantics.
  */
object TextFns {

  /** Let-binding for expression trees: evaluate `c` ONCE and reference it
    * as a lambda variable inside `f`. Higher-order functions are
    * interpreted (CodegenFallback, no common-subexpression elimination),
    * so an expression referenced per array element — e.g. the token array
    * inside a shingle `transform` — would otherwise be re-evaluated for
    * every element (measured 20× slowdowns on the dedup path). */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  // ── portable 60-bit hash ─────────────────────────────────────────────
  /** First 15 hex chars of md5 as a non-negative bigint (60 bits). Exactly
    * reproducible in any engine with md5 (DuckDB:
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`). Used instead of
    * xxhash64 wherever the oracle must re-derive the value. Computed by
    * the native [[graft.plans.PortableHash60]] (digest bytes → long, no
    * hex-string round trip). */
  def portableHash(c: Column): Column =
    graft.plans.PortableHash60(c.cast(StringType))

  /** SQL fragment producing the same value in DuckDB. */
  def portableHashSql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  // ── normalization / tokens ───────────────────────────────────────────
  /** Canonical text form for fingerprinting: lowercase, collapse runs of
    * whitespace, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c.cast(StringType)), "\\s+", " "))

  /** Whitespace tokens ('' — or null — text → zero tokens). NEVER NULL,
    * and declared so (the coalesce branch is unreachable but makes
    * `nullable = false`): a nullable token pipeline makes the optimizer
    * infer `isnotnull(<pipeline>)` predicates at filters and joins, and
    * predicate pushdown inlines the alias — so every inferred check
    * re-ran the whole tokenize chain per row below the projection that
    * was supposed to bind it once (round-9 plan census, q96/q104). With
    * a non-nullable root, those constraints are never generated and
    * every derived shingle/segment expression is non-nullable too. */
  def tokens(c: Column): Column = {
    val t = normText(c)
    coalesce(
      when(t === "", array().cast(ArrayType(StringType))).otherwise(split(t, " ")),
      array().cast(ArrayType(StringType)))
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: runs of letters, single digits, and single
    * punctuation marks each count as one token (the GPT-2 pre-tokenizer
    * shape, without the vocab). */
  def subwordCount(c: Column): Column =
    regexp_count(c.cast(StringType), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  // ── document fingerprint ─────────────────────────────────────────────
  /** 60-bit fingerprint of the normalized text — exact-dup detection key.
    * (The reference has no fingerprints; this is the scale path for D7
    * whole-row dup profiling: hash-compare instead of full-text
    * compare.) */
  def fingerprint(c: Column): Column = portableHash(normText(c))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): hash every
    * POSITIONAL char `k`-gram of the normalized text (a rolling k-gram
    * window — unlike [[charShingles]] these keep position and duplicates),
    * then keep the minimum hash of each window of `w` consecutive gram
    * hashes, distinct. Guarantees every shared substring of length
    * ≥ k + w − 1 contributes at least one shared fingerprint, with ~1/w
    * of the grams retained — the document-fingerprinting scale path:
    * near-dup detection joins on fingerprints (inverted index), never
    * compares texts. Texts shorter than k + w − 1 chars yield the single
    * minimum. Engine-portable: md5 gram hashes, min/distinct set ops. */
  def winnowingFingerprints(c: Column, k: Int = 5, w: Int = 4): Column =
    bindOnce(bindOnce(normText(c)) { t =>
      transform(
        sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
        i => portableHash(substring(t, i, lit(k))))
    }) { hs =>
      val nWin = size(hs) - (w - 1)
      when(nWin <= lit(0), array(array_min(hs)))
        .otherwise(array_distinct(
          transform(sequence(lit(1), nWin), i => array_min(slice(hs, i, lit(w))))))
    }

  // ── shingles ─────────────────────────────────────────────────────────
  /** Word n-gram shingles (array<string>), distinct, from normalized
    * text. Documents shorter than n words yield their full text as the
    * single shingle — the output is NEVER empty and NEVER NULL, and the
    * coalesce declares the latter: [[bindOnce]]'s element_at is
    * syntactically nullable, and a nullable shingle pipeline makes the
    * optimizer infer `isnotnull(<pipeline>)` at filters/joins, which
    * predicate pushdown inlines below the binding projection — one full
    * re-tokenization per row per inferred check (round-9 plan census).
    * The fallback branch is unreachable; it exists for `nullable=false`. */
  def wordShingles(c: Column, n: Int): Column =
    coalesce(
      bindOnce(tokens(c)) { toks =>
        val nsh = size(toks) - (n - 1)
        val grams = transform(
          sequence(lit(0), greatest(nsh - 1, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))
        when(size(toks) <= n, array(concat_ws(" ", toks))).otherwise(array_distinct(grams))
      },
      array(lit("")))

  /** Non-overlapping word `n`-gram SEGMENTS (array<string>, positional,
    * duplicates kept): windows at token offsets 0, n, 2n, … — the unit
    * for C4-style boilerplate detection, where a segment seen in many
    * distinct documents is template text. Docs shorter than n tokens
    * yield no segments. Pure per-row projection. */
  def segments(c: Column, n: Int): Column =
    bindOnce(tokens(c)) { toks =>
      val m = (size(toks) / n).cast(IntegerType)
      when(m <= 0, array().cast(ArrayType(StringType)))
        .otherwise(transform(sequence(lit(0), m - 1),
          i => concat_ws(" ", slice(toks, i * n + 1, lit(n)))))
    }

  /** Character n-gram shingles, distinct. */
  def charShingles(c: Column, n: Int): Column =
    bindOnce(normText(c)) { t =>
      val cnt = greatest(length(t) - (n - 1), lit(1))
      array_distinct(transform(sequence(lit(1), cnt), i => substring(t, i, lit(n))))
    }

  /** Duplicate word n-gram fraction (Gopher-style repetition signal):
    * 1 − distinct/total over POSITIONAL n-grams — boilerplate and looping
    * generations score high, natural text near 0. Short docs (< n tokens)
    * have one window and score 0. Pure per-row projection. */
  def repetitionFrac(c: Column, n: Int = 3): Column =
    bindOnce(tokens(c)) { toks =>
      val total = greatest(size(toks) - (n - 1), lit(1))
      bindOnce(transform(sequence(lit(0), total - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))) { grams =>
        Det.roundAt(
          (size(grams) - size(array_distinct(grams))).cast(DoubleType) / size(grams), 6)
      }
    }

  // ── language ID (n-gram / marker-word heuristic) ─────────────────────
  /** Marker stopwords per language; deterministic and cheap — a real
    * pipeline would swap in fastText, the plumbing stays identical. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is ", " with "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " los "),
    "de" -> Seq(" der ", " und ", " die ", " das ", " mit "),
    "fr" -> Seq(" le ", " les ", " des ", " est ", " une "))

  /** Predicted language = argmax marker hits; ties and zero hits →
    * 'unknown' unless a single language leads strictly. */
  def langId(c: Column): Column = bindOnce(
    concat(lit(" "), lower(c.cast(StringType)), lit(" "))) { padded =>
    def score(words: Seq[String]): Column =
      words.map(w => when(contains(padded, lit(w)), 1).otherwise(0))
        .reduce(_ + _)
    val scores  = LangMarkers.map { case (lang, ws) => lang -> score(ws) }
    val best    = greatest(scores.map(_._2): _*)
    val nBest   = scores.map { case (_, s) => when(s === best, 1).otherwise(0) }.reduce(_ + _)
    val winner  = scores.foldRight(lit("unknown"): Column) { case ((lang, s), rest) =>
      when(s === best, lit(lang)).otherwise(rest)
    }
    when(best === 0 || nBest > 1, lit("unknown")).otherwise(winner)
  }

  // ── quality scoring ──────────────────────────────────────────────────
  /** Heuristic document-quality signals (Gopher/C4-style filters):
    * length, mean word length, punctuation/digit/space ratios, stopword
    * presence. Returns a struct; `qualityScore` collapses it to one
    * double in [0,1]. */
  def qualitySignals(c: Column): Column = {
    val t      = c.cast(StringType)
    val nChars = length(t).cast(DoubleType)
    val nTok   = tokenCount(t).cast(DoubleType)
    val safe   = when(nChars === 0, 1.0).otherwise(nChars)
    struct(
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      (nChars / greatest(nTok, lit(1.0))).as("mean_word_len"),
      (regexp_count(t, lit("[.,;:!?]")).cast(DoubleType) / safe).as("punct_ratio"),
      (regexp_count(t, lit("[0-9]")).cast(DoubleType) / safe).as("digit_ratio"),
      (regexp_count(t, lit("[A-Za-z]")).cast(DoubleType) / safe).as("alpha_ratio"))
  }

  /** Composite quality in [0,1]: long-enough, word-shaped, mostly
    * alphabetic text scores high. Deterministic closed form. NEVER NULL
    * for non-null text — and declared so ([[tokens]]' rationale): score
    * bins feed groupBy/join keys (PSI/KS drift halves), and a nullable
    * bin made the optimizer infer `isnotnull(<bin>)` filters that
    * pushdown inlined into a full re-derivation of this pipeline per
    * row (round-9 plan census, q144 ×4 / q173). Null text scores 0.0 —
    * the same verdict the signals give empty text. */
  def qualityScore(c: Column): Column = {
    val s        = qualitySignals(c)
    val lenScore = least(s("n_tokens") / lit(20.0), lit(1.0))
    val wordLen  = s("mean_word_len")
    val shapeOk  = when(wordLen >= 2.5 && wordLen <= 12.0, 1.0).otherwise(0.5)
    val alpha    = s("alpha_ratio")
    coalesce(Det.roundAt(lenScore * shapeOk * alpha, 6), lit(0.0))
  }

  // ── PII scrubbing ────────────────────────────────────────────────────
  /** Conservative engine-portable PII patterns: ASCII character classes
    * and `\b` only, so Java regex (Spark codegen'd regexp_replace) and
    * RE2 (DuckDB) agree on every match. Deliberately precision-biased —
    * a training-data scrub that mangles non-PII text is worse than one
    * that misses an exotic obfuscation. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re: String  = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails, phone numbers, and IPv4 addresses with typed tags.
    * Email first — its local/domain parts could otherwise be nibbled by
    * the narrower patterns. Pure codegen'd regexp_replace chain: one pass
    * per pattern, no UDF, scales as a per-row projection. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-document PII hit counts as a struct (emails, phones, ips). */
  def piiCounts(c: Column): Column = struct(
    regexp_count(c, lit(EmailRe)).as("emails"),
    regexp_count(c, lit(PhoneRe)).as("phones"),
    regexp_count(c, lit(Ipv4Re)).as("ips"))
}
