package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-level merge training plus a
  * greedy encoder — the real-tokenizer upgrade over the regex token
  * count (TextOps.TokenRegex), for token-budget accounting of a
  * training corpus.
  *
  * Architecture mirrors the k-means quantizer (VectorOps): Spark does
  * the corpus-scale part — ONE shuffle of word tokens with map-side
  * combine into a distinct-word frequency table, truncated
  * DETERMINISTICALLY (freq desc, word asc) to `maxWords` rows — and the
  * merge loop, which is inherently sequential (merge k+1 depends on the
  * table after merge k), runs on the driver over that bounded table.
  * The collect is bounded by design: `maxWords` plays the role k plays
  * for centroids. Encoding then ships the merge table back as a
  * broadcast map.
  *
  * Ties on pair frequency break lexicographically, so the learned merge
  * table is a pure function of the corpus (reproducible across runs,
  * partitionings, and cluster sizes).
  */
object Bpe {

  /** One learned merge: `left`+`right` fuse into a new symbol, in rank
    * order (rank 0 = first, most frequent).
    */
  final case class Merge(rank: Int, left: String, right: String)

  /** Learn up to `nMerges` merges from the corpus. Stops early when no
    * adjacent pair occurs at least `minPairFreq` times. `maxWords`
    * bounds the driver-side word table (standard practice: rare-word
    * tails contribute negligibly to pair counts; the truncation is
    * deterministic so the result still is).
    */
  def train(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      minPairFreq: Long = 2L,
      maxWords: Int = 1 << 20
  ): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreqs = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
    trainOnWordTable(wordFreqs, nMerges, minPairFreq)
  }

  /** The sequential merge loop over the bounded word-frequency table. */
  private[graft] def trainOnWordTable(
      wordFreqs: Array[(String, Long)],
      nMerges: Int,
      minPairFreq: Long
  ): Seq[Merge] = {
    var words: Array[(Seq[String], Long)] =
      wordFreqs.map { case (w, f) => (w.map(_.toString): Seq[String], f) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val (syms, f) = words(i)
        var j = 0
        while (j + 1 < syms.length) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
        i += 1
      }
      // argmax with lexicographic tie-break, same rule as the oracle spec
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, kv @ (k, c)) =>
          acc match {
            case Some((bk, bc)) if bc > c || (bc == c &&
              (bk._1 < k._1 || (bk._1 == k._1 && bk._2 <= k._2))) => acc
            case _ => Some(kv)
          }
      }
      best.filter(_._2 >= minPairFreq) match {
        case None => done = true
        case Some(((l, r), _)) =>
          merges += Merge(rank, l, r)
          words = words.map { case (s, f) => (mergeOnce(s, l, r), f) }
          rank += 1
      }
    }
    merges.result()
  }

  /** Replace every non-overlapping adjacent (l, r) with the fused
    * symbol, left to right — the training-side merge application.
    */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Encode one word: start from characters, repeatedly apply the
    * LOWEST-rank merge present until none applies (the standard greedy
    * BPE encode — identical output to applying merges in rank order).
    */
  private[functions] def encodeWord(w: String, rankOf: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString)
    var cont = syms.length > 1
    while (cont) {
      val best = syms.iterator.sliding(2).withPartial(false)
        .flatMap(p => rankOf.get((p.head, p.last)).map(rk => (rk, p.head, p.last)))
        .minByOption(_._1)
      best match {
        case Some((_, l, r)) => syms = mergeOnce(syms, l, r)
        case None => cont = false
      }
      if (syms.length < 2) cont = false
    }
    syms
  }

  /** Per-document BPE token count under a learned merge table. The
    * merge table rides to executors as a broadcast map (never a plan
    * literal); documents stay where they are — pure projection shape,
    * no shuffle.
    */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rankOf = bc.value
        it.map { case (id, text) =>
          // Locale.ROOT: executor default locale must not change the
          // vocabulary (Turkish dotless-i would desync from the
          // locale-independent lower() used at training time)
          val n = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
            .filter(_.nonEmpty)
            .map(w => encodeWord(w, rankOf).length.toLong)
            .sum
          (id, n)
        }
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
