package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for LLM training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard (BASELINE.json north star).
  *
  * Scale architecture (the whole point of LSH): NEVER form the O(n²) pair
  * space. Exact dedup is one hash-aggregate. MinHash near-dup shuffles once
  * on (band, band_signature) — candidate pairs only materialize inside
  * buckets, which stay tiny when documents are genuinely distinct. That is
  * the 100 TB shape: cost ≈ |docs| × bands, not |docs|².
  *
  * Engine portability: all hashes are md5 hex strings (identical in Spark
  * and DuckDB), minima are lexicographic string-minima — the DuckDB oracle
  * can replay every step.
  */
object Dedup {

  /** Word n-gram shingles of the canonical (lowercased, whitespace-split)
    * token stream. element_at is 1-indexed, matching DuckDB list indexing.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(lower(text))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)
        ))
  }

  /** Distinct shingle set (for Jaccard). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Exact dedup: group by content hash, keep the lowest id
    * (reference A1 generalized — `SELECT DISTINCT` is the degenerate form;
    * one hash-aggregate, no pairwise anything).
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(TextOps.fingerprint(col(textCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("dup_count")
      )

  /** MinHash signature: k permutation-free hash functions
    * h_i(s) = md5(i || '|' || s); the signature component is the
    * lexicographic MIN hex digest over the doc's shingles. String minima
    * make the oracle trivial and are exactly as collision-resistant as the
    * underlying digest. Returns array<string> of length k.
    */
  def minhashSignature(text: Column, shingleN: Int, k: Int): Column = {
    val sh = shingleSet(text, shingleN)
    array((0 until k).map { i =>
      array_min(transform(sh, s => md5(concat(lit(i.toString), lit("|"), s))))
    }: _*)
  }

  /** LSH banding: split the k-row signature into bands of `rowsPerBand`,
    * hash each band to one bucket key. Docs sharing any (band, key) bucket
    * are near-dup candidates. Returns (band, band_key) pairs exploded —
    * |docs| × bands rows, the only thing that ever shuffles.
    */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    require(k % rowsPerBand == 0, "k must divide into bands evenly")
    val bands = k / rowsPerBand
    val sig   = minhashSignature(col(textCol), shingleN, k)
    val withSig = docs.select(col(idCol).as("doc_id"), sig.as("sig"))
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws("|", (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)).as("band_key")
      )
    }
    withSig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Candidate near-dup pairs from LSH buckets: self-join within buckets,
    * a < b, distinct across bands. Bucket sizes bound the join fan-out.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val b  = lshBands(docs, idCol, textCol, shingleN, k, rowsPerBand)
    val l  = b.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val r  = b.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Verified near-dup pairs: LSH candidates re-scored with true n-gram
    * Jaccard, thresholded. The expensive exact measure runs ONLY on
    * candidates (≈0 when the corpus is clean) — never on the full pair space.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.8,
                   k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val cands = minhashCandidatePairs(docs, idCol, textCol, shingleN, k, rowsPerBand)
    val sets  = docs.select(col(idCol).as("id"), shingleSet(col(textCol), shingleN).as("sh"))
    cands
      .join(sets.withColumnRenamed("id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Jaccard similarity of two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union === 0, lit(0.0)).otherwise(inter / union.cast("double"))
  }

  /** SimHash-64: per token, md5 → first 16 hex chars → 64-bit int; each bit
    * votes ±1; sign of the vote sum sets the output bit. Near-dup docs land
    * within small Hamming distance. conv() parses hex; the bit loop unrolls
    * into a codegen'd expression tree (64 aggregates over the token array —
    * all inside one projection, no shuffle).
    */
  def simhash64(text: Column): Column = {
    // Two 32-bit halves (8 hex chars each) so every value fits a signed
    // long and bit extraction is exact shift+mask — no decimal rounding.
    val toks  = TextOps.tokens(lower(text))
    val tokHi = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val tokLo = transform(toks, t => conv(substring(md5(t), 9, 8), 16, 10).cast("long"))
    def votesBit(arr: Column, j: Int): Column =
      aggregate(arr, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
    val bits = (0 until 64).map { j =>
      val votes = if (j < 32) votesBit(tokLo, j) else votesBit(tokHi, j - 32)
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two simhash-64 values. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
