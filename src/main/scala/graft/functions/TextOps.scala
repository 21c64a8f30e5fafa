package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis and document-deduplication operators for the
  * training-data-pipeline surface (builder brief; SURVEY.md §7.2 M6):
  * exact dedup, MinHash+LSH near-dup candidates, n-gram Jaccard,
  * SimHash fingerprints, token/quality stats, language-ID heuristic,
  * document fingerprinting.
  *
  * All operators are built from codegen'd builtins plus the two custom
  * expressions ([[SimHash64]], [[DotProduct]]); hash choices (md5) are
  * deliberately oracle-reproducible.
  */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** BPE-ish token segmentation: runs of letters, runs of digits, or
    * single other non-space chars — the word-count heuristic used for
    * token-count accounting before a real tokenizer runs.
    */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Contiguous word n-gram shingles (distinct), the near-dup unit.
    * Docs with fewer than n tokens produce an empty array. Native
    * expression ([[WordShingles]]) — the HOF composition
    * (`transform`+`element_at`) evaluated interpreted per element and
    * was ~300x slower.
    */
  def shingles(toks: Column, n: Int): Column =
    WordShingles.word_shingles(toks, n)

  /** Exact content dedup: group by content hash, elect the smallest
    * doc_id as keeper, count copies. Pure hash-aggregate — one shuffle
    * on the 16-byte hash, never on the text itself (project the hash
    * first so the shuffle doesn't carry document bodies).
    */
  def exactDedupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol).cast("binary")).as("text_hash"), col(idCol))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Per-doc MinHash signature columns h0..h{k-1}: min over shingles of
    * md5(j + ":" + shingle). The min of a cryptographic hash over a set
    * is a uniform sample of the set — equal mins between docs estimate
    * Jaccard similarity. md5-hex (not xxhash) so the SQL oracle can
    * reproduce signatures byte-for-byte.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      shingleSize: Int
  ): DataFrame = {
    val sh = docs
      .select(col(idCol), explode(shingles(tokens(col(textCol)), shingleSize)).as("__s"))
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j:"), col("__s")))).as(s"h$j"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: group r consecutive signature rows per band, hash the
    * band, self-join on (band, hash) → candidate near-dup pairs
    * (doc_a < doc_b, distinct). Probability a pair with Jaccard s
    * becomes a candidate: 1 - (1 - s^r)^b — the classic S-curve. The
    * join key is (band, 16-byte hash): collisions shuffle only doc ids.
    */
  def minhashCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int,
      rowsPerBand: Int,
      shingleSize: Int
  ): DataFrame = {
    val sig = minhashSignatures(docs, idCol, textCol, bands * rowsPerBand, shingleSize)
    val bandStructs = (0 until bands).map { b =>
      val h = md5(concat((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*))
      struct(lit(b).as("band"), h.as("h"))
    }
    val banded = sig
      .select(col(idCol), explode(array(bandStructs: _*)).as("__bh"))
      .select(col(idCol), col("__bh.band").as("band"), col("__bh.h").as("h"))
    val a = banded.select(col(idCol).as("doc_a"), col("band"), col("h"))
    val b = banded.select(col(idCol).as("doc_b"), col("band"), col("h"))
    a.join(b, Seq("band", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs: join
    * each side to its distinct shingle set, |A∩B| / |A∪B|. Candidates
    * bound the quadratic; this is the verify step after LSH.
    */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame, // columns doc_a, doc_b
      shingleSize: Int
  ): DataFrame = {
    val sets = docs.select(
      col(idCol),
      shingles(tokens(col(textCol)), shingleSize).as("ss"))
    val inter = size(array_intersect(col("ss_a"), col("ss_b")))
    val union = size(col("ss_a")) + size(col("ss_b")) - inter
    pairs
      .join(sets.select(col(idCol).as("doc_a"), col("ss").as("ss_a")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("ss").as("ss_b")), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        when(union === 0, lit(0.0))
          .otherwise(inter.cast(DoubleType) / union.cast(DoubleType))
          .as("jaccard"))
  }

  /** Per-doc text statistics: length, word/token counts, punctuation
    * count and ratio, stopword count and ratio — the quality-scoring
    * raw features. One projection, no shuffle.
    */
  def textStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = size(split(trim(t), "\\s+"))
    val toks = size(regexp_extract_all(t, lit(TokenRegex), lit(0)))
    val punct = size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val stop = size(expr(
      s"filter(split(trim($textCol), ' '), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))"))
    // ANSI mode: guard zero denominators (empty/whitespace-only docs)
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(null).cast(DoubleType))
        .otherwise(num.cast(DoubleType) / den.cast(DoubleType))
    docs.select(
      col(idCol),
      length(t).cast("long").as("text_len"),
      words.cast("long").as("n_words"),
      toks.cast("long").as("n_tokens"),
      punct.cast("long").as("n_punct"),
      ratio(punct, toks).as("punct_ratio"),
      stop.cast("long").as("n_stopwords"),
      ratio(stop, words).as("stopword_ratio"))
  }

  /** Language-ID heuristic: score = count of language-marker stopwords;
    * claim the language with a positive score, else 'unknown'. (A
    * deterministic n-gram/stopword heuristic — the operator contract a
    * real fastText-style model would slot into.)
    */
  def langId(docs: DataFrame, idCol: String, textCol: String, langCol: String): DataFrame = {
    val en = size(expr(
      s"filter(split(trim($textCol), ' '), x -> x IN ('the', 'a', 'of', 'and', 'is'))"))
    docs.select(
      col(idCol),
      col(langCol).as("lang"),
      when(en >= 1, lit("en")).otherwise(lit("unknown")).as("predicted_lang"),
      en.cast("long").as("en_score"))
  }

  /** Document fingerprint: md5 of case/whitespace-normalized text —
    * catches trivially-reformatted duplicates exact dedup misses.
    */
  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** SimHash near-dup pairs: fingerprint every doc (row-local custom
    * expression), band by FOUR disjoint 16-bit keys (the standard
    * rotated-table trick), self-join within each band bucket, filter by
    * hamming distance, dedup pairs found in multiple bands.
    *
    * Recall guarantee: a pair at hamming distance <= 3 differs in at
    * most 3 bits, which can touch at most 3 of the 4 bands — so the
    * pair agrees EXACTLY on at least one full 16-bit band and is always
    * a join candidate (pigeonhole).
    *
    * Skew guard: a degenerate band value (e.g. thousands of near-empty
    * docs with identical fingerprint bits) would go quadratic inside
    * its bucket; buckets larger than `bucketCap` docs are dropped
    * before the self-join. At the default cap this only fires on
    * pathological buckets where the quadratic join would dominate the
    * whole job — the pairs inside a dropped bucket are better served by
    * exact dedup (they are near-identical by construction).
    */
  def simhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      bucketCap: Long = 10000L
  ): DataFrame = {
    require(maxHamming <= 3, s"4 disjoint 16-bit bands guarantee recall only to hamming 3: $maxHamming")
    val fp = docs.select(
      col(idCol),
      SimHash64.simhash64(tokens(col(textCol))).as("simhash"))
    val bandStructs = (0 until 4).map { b =>
      struct(
        lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("h"))
    }
    val banded = fp
      .select(col(idCol), col("simhash"), explode(array(bandStructs: _*)).as("__b"))
      .select(col(idCol), col("simhash"), col("__b.band").as("band"), col("__b.h").as("h"))
    val keptBuckets = banded
      .groupBy(col("band"), col("h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= bucketCap)
      .select(col("band"), col("h"))
    val guarded = banded.join(keptBuckets, Seq("band", "h"))
    val a = guarded.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"), col("band"), col("h"))
    val b = guarded.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"), col("band"), col("h"))
    a.join(b, Seq("band", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
  }
}
