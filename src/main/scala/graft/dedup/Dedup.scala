package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Engine portability: every hash the ORACLE must replay is md5-derived
  * (md5 hex strings for fingerprints; the 13-hex-digit / 52-bit md5
  * prefix for minhash's base hash) with exact-integer mixing on top —
  * DuckDB replays every step bit-identically. Hashes that only bucket or
  * join WITHIN the engine (band keys, gram identities) ride xxhash64
  * longs, where only the partition induced by equality matters.
  */
object Dedup {

  /** Word n-gram shingles of the canonical (lowercased, whitespace-split)
    * token stream.
    *
    * Built with slice + zip_with, NOT `transform(sequence(...), i =>
    * element_at(toks, i+k))`: a higher-order-function lambda re-evaluates
    * outer expression references PER ELEMENT, so indexing into the (regex
    * split) token expression from a lambda body is O(tokens²) per document
    * — a thread dump showed the whole 150s of the original LSH query inside
    * StringSplit under ConcatWs. Slices reference the token expression a
    * constant number of times per row instead.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(lower(text))
    def windowLen = size(toks) - (n - 1)
    val shifted   = (0 until n).map(k => slice(toks, lit(k + 1), windowLen))
    val joined = shifted.reduce((acc, s) =>
      zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
    when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(joined)
  }

  /** Distinct shingle set (for Jaccard). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** n-gram IDENTITIES as xxhash64 longs WITHOUT materializing the gram
    * strings: hash each token once, then hash each n-window of token
    * hashes — two grams are equal iff their token sequences are equal,
    * so this is the [[shingles]] identity under a different injection.
    * Consumers that only JOIN/GROUP/COUNT gram keys (decontamination,
    * overlap matrices, rare-gram edges, prefix candidates) get 8-byte
    * keys and zero per-gram string allocation. Docs shorter than n
    * contribute one whole-doc gram, matching [[shingles]]'s short-doc
    * convention.
    *
    * Runs as the native [[graft.functions.GramHashes]] expression (one
    * fused codegen loop); it emits values bit-identical to the earlier
    * `transform`/`arrays_zip`/`xxhash64(struct)` composition, which as
    * CodegenFallback HOFs allocated n array views + one struct per
    * window and dominated the gram-table build (measured 1.25s → ~0.3s
    * for the sf0.1 8-gram corpus pass).
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.GramHashes.gram_hashes(TextOps.tokens(lower(text)), n)

  /** Distinct hashed-gram set (the [[shingleSet]] identity as longs). */
  def shingleHashSet(text: Column, n: Int): Column =
    array_distinct(shingleHashes(text, n))

  /** Prefix-duplicate detection: flag documents whose FULL token sequence
    * is a strict prefix of some longer document — the truncated-crawl dup
    * class exact dedup misses (different full hash) and Jaccard
    * under-scores (a short prefix of a long doc has low set overlap).
    * Candidates are docs ≤ maxPrefixLen tokens (truncation dups are
    * short); every doc emits one prefix hash per DISTINCT candidate
    * length below its own — |docs| × |candidate lengths| rows, capped by
    * maxPrefixLen — then ONE equi-join on the content hash. A full-text
    * hash equals a prefix hash iff the strings are equal; equal-length
    * docs never match (hosts hash only lengths < their own), so exact
    * dups are NOT flagged — strictly-shorter prefixes only. Never
    * doc×doc.
    */
  def prefixDups(docs: DataFrame, idCol: String, textCol: String,
                 maxPrefixLen: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(lower(col(textCol))).as("t"))
      .withColumn("n", size(col("t")))
    val cands = toks.filter(col("n") <= maxPrefixLen)
      .select(col("doc_id"), col("n"), md5(concat_ws(" ", col("t"))).as("h"))
    val lens = cands.select(col("n").as("len")).distinct()
    val hosts = toks.join(broadcast(lens), col("len") < col("n"))
      .select(col("doc_id").as("host_id"),
        md5(concat_ws(" ", slice(col("t"), lit(1), col("len")))).as("h"))
    cands.join(hosts, Seq("h"), "left")
      .groupBy("doc_id", "n")
      .agg(count(col("host_id")).as("n_hosts"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_hosts"),
        (col("n_hosts") > 0).as("is_prefix_dup"))
  }

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

  /** MinHash signature: k universal hash functions
    * h_i(s) = (A_i · u(s) + B_i) mod (2^61 − 1) over the 52-bit md5
    * prefix u(s) of each shingle; the signature component is the numeric
    * MIN over the doc's shingles. ONE digest per shingle + k long mixes —
    * the earlier h_i = md5(i || '|' || s) scheme paid k digests per
    * shingle, the dominant cost of the whole LSH build at corpus scale.
    * Returns array<long> of length k. The DuckDB oracle replays u as the
    * 13-nibble md5 fold and the mix in HUGEINT — bit-identical; see
    * [[graft.functions.MinHashSig]] for the full portability argument.
    *
    * Runs as the fused [[graft.functions.MinHashSigTokens]] (token
    * windows streamed straight into md5 — no shingle string, no
    * array_distinct pass; signature-identical, see its scaladoc).
    */
  def minhashSignature(text: Column, shingleN: Int, k: Int): Column =
    graft.functions.MinHashSig.minhash_sig_tokens(
      TextOps.tokens(lower(text)), shingleN, k)

  /** LSH banding: split the k-row signature into bands of `rowsPerBand`,
    * hash each band to one bucket key; docs sharing any (band, key)
    * bucket are near-dup candidates. Returns (bands, signature frame) —
    * the signature frame is PERSISTED and the caller owns unpersisting it
    * once the bands are fully consumed ([[minhashCandidatePairs]] does;
    * the former public `lshBands` wrapper that leaked this lifecycle to
    * ContextCleaner GC had no callers and was removed in r9 — band
    * consumers go through [[minhashCandidatePairs]]).
    */
  private[graft] def lshBandsWithSig(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, k: Int = 16, rowsPerBand: Int = 4): (DataFrame, DataFrame) = {
    require(k % rowsPerBand == 0, "k must divide into bands evenly")
    val bands = k / rowsPerBand
    // Compute the k-hash signature in ONE projection, then materialize it
    // behind persist(): InMemoryRelation is a barrier Catalyst won't
    // collapse projections through, so past it `sig` is a bound attribute
    // and the 16 element_at band references cost pointer reads. Without a
    // barrier, Catalyst inlines the whole signature expression into every
    // reference (measured 16× work); an RDD-conversion barrier instead
    // drops the projection out of whole-stage codegen (measured 3×
    // slower). The cached slice is only (id, k longs) — what a
    // multi-stage pipeline would persist between stages at warehouse
    // scale. (The hex-era caveat about array<string> cache encoding does
    // not apply: array<long> is primitive-encoded.)
    val sigDf = docs.select(col(idCol).as("doc_id"),
      minhashSignature(col(textCol), shingleN, k).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // null/empty-text docs have a NULL signature (minhash_sig's
    // null-on-empty contract). Banding them anyway would xxhash64 the
    // same all-null band slices into ONE shared band_key per band — a
    // single quadratic candidate bucket growing n²_null pairs that every
    // verifier later discards (null tk fails any overlap predicate), so
    // output parity holds but candidate generation can blow up (r15
    // ADVICE). Content-less docs are not near-dup candidates: drop the
    // null signatures before banding, mirroring the exact SSJoin's
    // sz > 0 filter.
    val banded = sigDf
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), explode(array(bandStructs(col("sig"), bands, rowsPerBand): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    (banded, sigDf)
  }

  /** Band structs over a bound signature attribute — shared by the batch
    * path above and the STREAMING near-dup detector
    * ([[graft.streaming.EventStreams.nearDupStream]]), so both bucket by
    * bit-identical keys. Band b = sig components [b·rowsPerBand,
    * (b+1)·rowsPerBand); the bucket key is xxhash64 over the band's
    * longs — an 8-byte long through every bucket groupBy/join; bucketing
    * by h(x) equals bucketing by x absent collisions, which the
    * capped==uncapped and oracle-replay checks re-prove per corpus.
    */
  private[graft] def bandStructs(sig: Column, bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r =>
          element_at(sig, b * rowsPerBand + r + 1)): _*).as("band_key"))
    }

  /** Triangle-block salting — the poison-bucket guard shared by the MinHash
    * and SimHash candidate paths. Docs in a bucket of size s get one of
    * g = ceil(s / maxBucket) salts; a doc with salt x replicates into the g
    * blocks {(min(x,t), max(x,t)) : t < g} — exactly the blocks covering
    * pairs that involve salt x. Every pair (salts x, y) lands in block
    * (min,max) together, so recall is preserved (capped == uncapped after
    * distinct); block population is ≤ 2·maxBucket docs, so no task ever
    * materializes an O(bucket²) expansion or an O(bucket) array row.
    * Replication is g rows per doc ≈ bucket/maxBucket — proportional to the
    * inherent pair work, never the corpus. Bucket size comes from a count
    * window over the SAME bucket-column partitioning (exchange reused),
    * before any array materializes. maxBucket == Int.MaxValue ⇒ one block
    * per bucket (the oracle-checked default).
    */
  private def triangleBlocked(banded: DataFrame, bucketCols: Seq[String],
                              idCol: String, maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue)
      banded.withColumn("__blk", lit(0L))
    else {
      val g = ceil(
        count(lit(1)).over(Window.partitionBy(bucketCols.map(col): _*))
          .cast("double") / maxBucket).cast("int")
      banded.withColumn("__g", g)
        .withColumn("__salt", pmod(crc32(col(idCol).cast("string")), col("__g")).cast("int"))
        .withColumn("__blk", explode(transform(
          sequence(lit(0), col("__g") - 1),
          t => least(col("__salt"), t).cast("long") * 1000000 + greatest(col("__salt"), t))))
        .drop("__g", "__salt")
    }

  /** Candidate near-dup pairs from LSH buckets. NOT a bucket self-join
    * (which would evaluate the signature pipeline once per join side):
    * one signature pass, one shuffle on (band, band_key), then in-bucket
    * pair expansion with array ops. Cost ≈ |docs|·bands + Σ bucket²,
    * never |docs|².
    *
    * EAGER: the pair set is materialized (localCheckpoint) at call time —
    * not when the caller first consumes it — so the |docs|-sized signature
    * cache can be released immediately instead of accumulating one
    * persisted frame per invocation. The returned frame's own (small:
    * bounded by true near-dup density) checkpoint blocks live until the
    * frame is driver-GC'd and ContextCleaner reaps them; callers that fully
    * consume the pairs and want deterministic release should use
    * [[minhashCandidatePairsTracked]].
    *
    * @param maxBucket poison-bucket guard for huge corpora: buckets larger
    *   than this (boilerplate-heavy shingle profiles) are SALTED into
    *   triangle blocks (see [[triangleBlocked]]) so every pair is still
    *   produced with bounded per-task state. Default unlimited — one block
    *   per bucket, which the oracle checks; at 100 TB set it to a few
    *   hundred. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, k: Int = 16, rowsPerBand: Int = 4,
                            maxBucket: Int = Int.MaxValue): DataFrame =
    minhashCandidatePairsTracked(docs, idCol, textCol, shingleN, k, rowsPerBand, maxBucket)._1

  /** [[minhashCandidatePairs]] plus the checkpoint blocks backing the
    * returned frame, for callers that materialize their own derivative and
    * can then release the pair set deterministically
    * ([[Checkpoints.release]]) instead of waiting for ContextCleaner GC.
    */
  private[graft] def minhashCandidatePairsTracked(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, rowsPerBand: Int = 4,
      maxBucket: Int = Int.MaxValue): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val (b, sigDf) = lshBandsWithSig(docs, idCol, textCol, shingleN, k, rowsPerBand)
    val blocked = triangleBlocked(b, Seq("band", "band_key"), "doc_id", maxBucket)
    val buckets = blocked
      .groupBy("band", "band_key", "__blk")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    // ordered pairs (ids[i], ids[j]) for i < j; ids sorted ⇒ doc_a ≤ doc_b,
    // with equality only under duplicate input ids — filtered below to
    // match the oracle's strict doc_a < doc_b join.
    val pairs = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("doc_a"), y.as("doc_b")))))
    // Eager-materialize (localCheckpoint) so the signature cache can be
    // released NOW; the checkpoint doubles as the lineage barrier —
    // downstream consumers (Jaccard verification, components) replan
    // against a flat scan of the pairs.
    val (out, blocks) = Checkpoints.tracked(buckets
      .select(explode(pairs).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct())
    sigDf.unpersist()
    (out, blocks)
  }

  /** Incremental-ingest candidate pairs: near-dup candidates BETWEEN an
    * existing corpus and an incoming batch — never existing×existing. The
    * continuous-ingestion shape: band the incoming batch and equi-join it
    * against the corpus band table (the reusable state a pipeline
    * materializes once and appends to), so per-batch work is
    * |incoming|·bands + matched buckets — independent of the corpus pair
    * space, which a full re-dedup would re-form on every batch. Eagerly
    * materialized (localCheckpoint) like [[minhashCandidatePairs]] so
    * both signature caches release on return; the checkpoint blocks stay
    * with the frame (ContextCleaner reclaims them with it).
    * Output: (existing_id, incoming_id), distinct.
    */
  def incrementalCandidatePairs(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val (be, sigE) = lshBandsWithSig(existing, idCol, textCol, shingleN, k, rowsPerBand)
    val (bi, sigI) = lshBandsWithSig(incoming, idCol, textCol, shingleN, k, rowsPerBand)
    val out = Checkpoints.output(
      be.select(col("band"), col("band_key"), col("doc_id").as("existing_id"))
        .join(bi.select(col("band"), col("band_key"), col("doc_id").as("incoming_id")),
          Seq("band", "band_key"))
        // overlapping inputs (a doc present in both frames) must not emit
        // the self-pair — Jaccard would score it 1.0 and flag a phantom dup
        .filter(col("existing_id") =!= col("incoming_id"))
        .select("existing_id", "incoming_id")
        .distinct())
    sigE.unpersist(); sigI.unpersist()
    out
  }

  /** Verified near-dup pairs: LSH candidates re-scored with true n-gram
    * Jaccard, thresholded. The expensive exact measure runs ONLY on
    * candidates (≈0 when the corpus is clean) — never on the full pair space.
    *
    * EAGER (like [[minhashCandidatePairs]]): the verified pair set — even
    * smaller than the candidate set — is materialized at call time, which
    * lets this method release the candidate checkpoint deterministically
    * instead of leaving it to ContextCleaner GC.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.8,
                   k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val (cands, candBlocks) =
      minhashCandidatePairsTracked(docs, idCol, textCol, shingleN, k, rowsPerBand)
    val out = nearDupPairsFrom(cands, docs, idCol, textCol, shingleN, threshold)
    Checkpoints.release(candBlocks)
    out
  }

  /** The Jaccard-verification stage of [[nearDupPairs]] over a PREBUILT
    * candidate-pair frame (doc_a, doc_b) — for callers that amortize one
    * candidate materialization across several consumers (pairs report,
    * cluster building, edit-distance verification) instead of re-running
    * the signature→band→bucket pipeline per consumer. Does NOT release the
    * candidate frame's blocks: the caller owns that lifecycle. EAGER like
    * [[nearDupPairs]] (the verified set is checkpointed at call time).
    */
  def nearDupPairsFrom(cands: DataFrame, docs: DataFrame, idCol: String,
                       textCol: String, shingleN: Int = 3,
                       threshold: Double = 0.8): DataFrame = {
    // verification rides xxhash64 GRAM KEYS (the q142 convention): the
    // two candidate joins shuffle 8-byte longs per shingle instead of
    // n-gram strings, and Jaccard is a pure function of SET IDENTITY —
    // bit-identical under the bijection, re-proven by every green oracle
    // run (a collision could only merge two grams of the same doc pair).
    // Shingle ONLY candidate-incident documents: the semi-join runs
    // BELOW the shingle projection, so the per-token hash work scales
    // with the candidate set (bounded by near-dup density), not the
    // corpus — the full scan would otherwise tokenize+hash every doc
    // once per join side.
    val candIds = cands.select(col("doc_a").as("id"))
      .union(cands.select(col("doc_b").as("id")))
      .distinct()
    val sets = docs.select(col(idCol).as("id"), col(textCol))
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"), sort_array(shingleHashSet(col(textCol), shingleN)).as("sh"))
    val (out, _) = Checkpoints.tracked(cands
      .join(sets.withColumnRenamed("id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard", sortedJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        graft.ops.CoreOps.roundPortable(col("jaccard"), 6).as("jaccard")))
    out
  }

  /** EXACT set-similarity self-join via global-frequency prefix filtering
    * (the PPJoin/Vernica-Carey-Li MapReduce construction): every pair of
    * documents whose distinct-token Jaccard is ≥ thrNum/thrDen, with NO
    * false negatives — the exactness guarantee the MinHash/SimHash
    * families trade away. Threshold and verification are pure INTEGER
    * arithmetic (inter·den ≥ num·union; prefix length via ceiling
    * division), so no float boundary can fall differently in any engine.
    *
    * Construction: tokens get a global total order (document frequency
    * ascending, then token — rarest first); each document contributes
    * only its first `sz − ⌈t·sz⌉ + 1` tokens in that order as its
    * PREFIX; two documents can reach Jaccard t only if their prefixes
    * share a token (the prefix-filtering theorem), so the candidate join
    * is an equi-join on prefix tokens, pre-filtered by the length bound
    * min·den ≥ num·max, then verified exactly.
    *
    * The prefix machinery runs on xxhash64 GRAM KEYS, not gram strings
    * (the df/rank/join shuffles carry 8-byte longs instead of n-gram
    * text — measured 13.8s → ~6s on the q142 bench shape). The theorem
    * holds for ANY consistent global order, so ordering by (df, hash)
    * instead of (df, token) changes candidates but never loses a true
    * pair; a hash collision can only MERGE two grams' identities, which
    * adds false candidates the exact verification removes. (The oracle
    * replays the string-ordered construction and must agree row-for-row
    * on the verified OUTPUT — a per-run proof of order-independence.)
    *
    * Scale: never the O(n²) pair space — candidates materialize only
    * inside per-token buckets, and ordering prefixes rarest-first keeps
    * hot tokens out of most prefixes (a stopword enters a prefix only
    * for documents made almost entirely of stopwords). The df table is
    * vocabulary-sized; the per-document ranking window partitions by
    * document (doc-sized groups). DedupSpec proves the no-false-negative
    * claim against the brute-force all-pairs join on random corpora.
    *
    * `suffixFilter` adds the PPJoin+ suffix level (lossless — see
    * [[prefixCandidates]]). It is a DENSITY dial, off by default: the
    * setup (a materialized global token rank + per-doc rank arrays)
    * pays only when prefix candidates are plentiful relative to true
    * pairs — measured 17% candidate drop with recall unchanged on a
    * Zipf near-dup fixture (Round9Spec), but a 2× slowdown on the
    * synthetic q142 corpus whose candidate set is already just 3% of
    * the pair space. Enable on power-law / boilerplate-heavy corpora
    * where verification dominates. `suffixDepth = 2` is the dial's next
    * notch: a second recursive window split (two more pivots + binary
    * searches per pair) that subsumes depth 1, stays lossless, and
    * prunes candidates whose token distributions align at half- but not
    * quarter-window granularity — the class depth 1 cannot see
    * (Round10Spec's saturation fixture; 8.9% further pruned on Zipf).
    */
  /** Conf key: token-table budget (bytes) under which [[prefixFilterPairs]]
    * verifies candidates against a BROADCAST doc→tokens map instead of two
    * array-carrying joins. See the r14 scale note in the method doc. */
  val BroadcastVerifyBytesKey = "spark.graft.prefix.broadcastVerifyBytes"
  val DefaultBroadcastVerifyBytes: Long = 1500L * 1000 * 1000

  /** Conf keys: the PAIR-SPACE regime guard (r15). An exact set-similarity
    * join on a saturating fixed-vocabulary corpus has an inherent ~n²/V
    * candidate space — no filter ladder changes that asymptote, and the
    * r14 sf4 grid measured where it lands (310M candidates; the
    * array-carrying verify filled the disk). The guard estimates the
    * candidate shuffle volume BEFORE any pair materializes, from the
    * already-checkpointed prefix frame: Σ over prefix tokens of
    * cnt·(cnt−1)/2 upper-bounds the bucket join's output multiset.
    * Above the warn threshold it logs the documented escape (LSH q19 /
    * dedup-first, with the recall contract stated); above the hard cap
    * (default off) it fails fast — the alternative the cap replaces is
    * hours of shuffle ending in a full disk. */
  val PairShuffleWarnBytesKey = "spark.graft.prefix.pairShuffleWarnBytes"
  val DefaultPairShuffleWarnBytes: Long = 100L * 1000 * 1000 * 1000
  val MaxPairShuffleBytesKey = "spark.graft.prefix.maxPairShuffleBytes"

  /** Estimated candidate-verification shuffle volume (pure, spec-pinned):
    * the broadcast shape ships 16-byte id pairs; the join shape attaches
    * both token arrays (8 B/token + tuple overhead) to every candidate. */
  def pairShuffleBytes(estPairs: Double, avgTokensPerDoc: Double,
                       broadcastShape: Boolean): Double =
    if (broadcastShape) estPairs * 16.0
    else estPairs * (2.0 * avgTokensPerDoc * 8.0 + 32.0)

  /** Merge-intersection count of two sorted-distinct long arrays — the
    * plain-JVM twin of [[graft.functions.SortedIntersect]] (same
    * definition on the same contract, so both verification paths count
    * identical integers). */
  private[graft] def intersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
                        thrNum: Int, thrDen: Int, shingleN: Int = 1,
                        suffixFilter: Boolean = false,
                        suffixDepth: Int = 1,
                        broadcastVerify: Option[Boolean] = None): DataFrame = {
    val (cands, stoks, prefix, blocks) =
      prefixCandidates(docs, idCol, textCol, thrNum, thrDen, shingleN,
        suffixFilter, suffixDepth)
    verifyPrefixCandidates(cands, stoks, prefix, blocks, thrNum, thrDen,
      broadcastVerify)
  }

  /** Verification-shape plan for [[verifyPrefixCandidates]], computed ONCE
    * from the checkpointed token/prefix frames so [[ssJoinPairsAuto]] can
    * make its escape decision on the SAME numbers the pair-space guard
    * acts on (two bookkeeping aggregates; no candidate materializes). */
  private[graft] final case class VerifyPlan(idIsLong: Boolean,
                                             takeBroadcast: Boolean,
                                             estPairs: Double,
                                             avgSz: Double,
                                             estShuffle: Double)

  private[graft] def planVerify(stoks: DataFrame, prefix: DataFrame,
                                broadcastVerify: Option[Boolean]): VerifyPlan = {
    val spark = stoks.sparkSession
    val idIsLong = stoks.schema("id").dataType ==
      org.apache.spark.sql.types.LongType
    // A caller FORCING the broadcast shape on a non-long id would get a
    // silent downgrade to the join shape — fail loud instead (r14 ADVICE).
    require(idIsLong || !broadcastVerify.contains(true),
      s"prefixFilterPairs(broadcastVerify=true): the id column must be " +
        s"LongType for the broadcast index, got ${stoks.schema("id").dataType.sql}")
    // one bookkeeping agg over the checkpointed token table serves both
    // the broadcast budget gate and the pair-space regime guard
    val tokEst = stoks.agg(sum(col("sz")), count(lit(1))).head()
    val totalTokens = if (tokEst.isNullAt(0)) 0L else tokEst.getLong(0)
    val nDocs = tokEst.getLong(1)
    val takeBroadcast = broadcastVerify.getOrElse {
      val bytes = totalTokens * 8L +
        nDocs * 96L // per-entry map + array-header overhead
      val cap = spark.conf.getOption(BroadcastVerifyBytesKey)
        .map(_.toLong).getOrElse(DefaultBroadcastVerifyBytes)
      // The estimate is the index's RESIDENT size; building it and the
      // torrent-broadcast serialization both transiently hold more. Never
      // let the auto gate commit more than a quarter of the driver's heap
      // regardless of the configured cap (r14 ADVICE: a cap tuned for one
      // deployment OOMed a smaller driver where the join shape — slowly —
      // succeeded). Forcing broadcastVerify=Some(true) bypasses this:
      // the caller owns the sizing.
      val driverCap = Runtime.getRuntime.maxMemory / 4
      idIsLong && bytes <= math.min(cap, driverCap)
    }
    // ---- pair-space estimate (r15 — the regime guard's input) ------------
    // Estimated BEFORE any candidate materializes, from the prefix
    // checkpoint: the bucket join's output is Σ_t idxCnt_t·cnt_t, upper-
    // bounded by Σ_t cnt_t·(cnt_t−1)/2 over prefix-token buckets. Double
    // arithmetic: this is a regime detector, not an accountant, and the
    // sums would overflow a long exactly where the guard matters most.
    val estPairs = {
      val r = prefix.groupBy("tokid").agg(count(lit(1)).as("__c"))
        .agg(sum(expr("__c * (__c - 1d) / 2.0d"))).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    val avgSz = if (nDocs == 0) 0.0 else totalTokens.toDouble / nDocs
    val estShuffle = pairShuffleBytes(estPairs, avgSz,
      broadcastShape = takeBroadcast && idIsLong)
    VerifyPlan(idIsLong, takeBroadcast, estPairs, avgSz, estShuffle)
  }

  /** The verification stage of [[prefixFilterPairs]] over prebuilt
    * [[prefixCandidates]] output — split out so [[ssJoinPairsAuto]] can
    * estimate the pair space FIRST (via [[planVerify]]) and only then
    * commit to the exact shape. Releases `blocks` after the output
    * checkpoint materializes. */
  private[graft] def verifyPrefixCandidates(cands: DataFrame, stoks: DataFrame,
      prefix: DataFrame, blocks: Seq[org.apache.spark.rdd.RDD[_]],
      thrNum: Int, thrDen: Int, broadcastVerify: Option[Boolean],
      plan: Option[VerifyPlan] = None): DataFrame = {
    val spark = cands.sparkSession
    // Verification merge-intersects the per-doc SORTED arrays — tokid
    // ranks with the suffix filter on, sorted gram hashes off; either way
    // longs in bijection with the grams (xxhash64 collisions could merge
    // gram identities with probability ~sz²·2⁻⁶⁴ per pair; the
    // string-exact oracle replay re-proves absence on every gated corpus).
    //
    // TWO physical shapes, identical output (the r14 sf4 grid's finding):
    //  - join-verify: attach both token arrays to every candidate pair.
    //    On a SATURATING corpus candidates grow ~n²/V (sf4 fixed-vocab:
    //    ~310M pairs), and pairs × arrays is a terabyte-class shuffle —
    //    measured 828s median at sf4, and the suffix-filter variant
    //    (which attaches arrays a second time to prune) filled the disk.
    //  - broadcast-verify: when the whole token table fits the budget
    //    (spark.graft.prefix.broadcastVerifyBytes, default 1.5 GB — a
    //    normal executor broadcast allowance — AND at most a quarter of
    //    the driver heap, whichever is smaller), candidates shuffle as bare
    //    16-byte id pairs and verify against a broadcast doc→tokens map:
    //    the array shuffle disappears entirely. Above the budget the join
    //    shape returns (arrays genuinely too big to replicate) — at THAT
    //    scale an exact SSJoin on a saturating corpus is inherently
    //    pair-bound, and the engine's documented answer is LSH (q19) or
    //    dedup-first. Same gate-with-fallback pattern as the Similarity
    //    codebook inlining.
    val VerifyPlan(idIsLong, takeBroadcast, estPairs, avgSz, estShuffle) =
      plan.getOrElse(planVerify(stoks, prefix, broadcastVerify))
    // ---- pair-space regime guard (r15 — the q142 escape hatch) -----------
    val hardCap = spark.conf.getOption(MaxPairShuffleBytesKey).map(_.toLong)
    val warnCap = spark.conf.getOption(PairShuffleWarnBytesKey)
      .map(_.toLong).getOrElse(DefaultPairShuffleWarnBytes)
    if (hardCap.exists(estShuffle > _)) {
      Checkpoints.release(blocks)
      throw new IllegalStateException(
        f"prefixFilterPairs: estimated candidate shuffle $estShuffle%.3g B " +
          f"(~$estPairs%.3g candidate pairs) exceeds $MaxPairShuffleBytesKey=" +
          s"${hardCap.get} — the exact SSJoin is pair-bound on this corpus. " +
          "Use LSH banding (Dedup.minhashCandidatePairs / q19 — probabilistic recall " +
          "per the banding curve) or dedup-first to shrink the corpus, or " +
          "raise the cap to accept the shuffle.")
    } else if (estShuffle > warnCap) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"prefixFilterPairs: estimated candidate shuffle $estShuffle%.3g B " +
          f"(~$estPairs%.3g candidate pairs, avg $avgSz%.1f tokens/doc) is " +
          "in the pair-bound regime for an exact set-similarity join. It " +
          "will complete but scales with the pair space; consider LSH " +
          "banding (Dedup.minhashCandidatePairs / q19 — probabilistic recall per " +
          "the banding curve) or dedup-first. Hard cap: " +
          s"$MaxPairShuffleBytesKey.")
    }
    var bIndex: Option[org.apache.spark.broadcast.Broadcast[
      scala.collection.mutable.LongMap[Array[Long]]]] = None
    val verified: DataFrame =
      if (takeBroadcast && idIsLong) {
        import spark.implicits._
        // Stream the index in partition-at-a-time (toLocalIterator via the
        // primitive-typed Dataset): peak driver demand is the LongMap plus
        // ONE partition of rows, not a full collected Row[] alongside a
        // boxed-key Map (the r14 ADVICE transient-overhead finding).
        // LongMap keys are unboxed longs; values are the primitive arrays.
        val index = new scala.collection.mutable.LongMap[Array[Long]]()
        val localIt = stoks.select(col("id"), col("stoks"))
          .as[(Long, Array[Long])].toLocalIterator()
        while (localIt.hasNext) {
          val kv = localIt.next(); index.update(kv._1, kv._2)
        }
        val bc = spark.sparkContext.broadcast(index)
        bIndex = Some(bc)
        cands.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
          .as[(Long, Long)]
          .mapPartitions { it =>
            val m = bc.value
            def tokensOf(id: Long): Array[Long] = {
              val t = m.getOrNull(id)
              if (t == null) throw new IllegalStateException(
                s"prefixFilterPairs broadcast-verify: candidate doc id $id " +
                  "is missing from the token index — candidates and the " +
                  "index must derive from the same corpus frame")
              t
            }
            it.flatMap { case (a, b) =>
              val ta = tokensOf(a); val tb = tokensOf(b)
              val inter = intersectCount(ta, tb)
              // same integer predicate as the join shape's filter;
              // Option fields make the encoder's schema NULLABLE, so
              // both verify shapes write the identical parquet schema
              // (a when(true,…) wrapper would fold away inside the
              // output checkpoint's optimized plan)
              if (inter.toLong * thrDen >=
                  (ta.length.toLong + tb.length - inter) * thrNum)
                Some((Option(a), Option(b), Option(inter),
                  Option(ta.length), Option(tb.length)))
              else None
            }
          }
          .toDF("doc_a", "doc_b", "inter", "sz_a", "sz_b")
          .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      } else {
        cands
          .join(stoks.select(col("id").as("doc_a"), col("stoks").as("tk_a"), col("sz").as("sz_a")), Seq("doc_a"))
          .join(stoks.select(col("id").as("doc_b"), col("stoks").as("tk_b"), col("sz").as("sz_b")), Seq("doc_b"))
          .withColumn("inter",
            graft.functions.SortedIntersect.sorted_intersect_count(col("tk_a"), col("tk_b")))
          .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
          .filter(col("inter") * thrDen >= col("union_sz") * thrNum)
      }
    // candidate pairs are SIZE-oriented (a = smaller, the indexing-prefix
    // orientation); the output contract is id-ordered doc_a < doc_b.
    // Both shapes land here with identical (doc_a, doc_b, inter,
    // union_sz) integers; jaccard is computed by the SAME Column
    // expressions either way, so the FP result is bit-identical.
    val out = Checkpoints.output(verified
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        col("inter"), col("union_sz"),
        graft.ops.CoreOps.roundPortable(
          col("inter").cast("double") / col("union_sz").cast("double"), 6).as("jaccard")))
    // the output checkpoint above is EAGER, so nothing can re-read the
    // broadcast index: free its driver + executor copies now instead of
    // waiting on ContextCleaner (r14 ADVICE — the index is the single
    // biggest driver-side allocation in the dedup family)
    bIndex.foreach(_.destroy())
    Checkpoints.release(blocks)
    out
  }

  /** The two physical answers to a set-similarity join, for
    * [[ssJoinPairsAuto]]'s dispatch (the [[graft.ops.ShapeDispatch]]
    * pattern applied to the dedup family). */
  sealed trait SsJoinShape
  /** the lossless PPJoin+ prefix-filter join — every true pair, exactly
    * ([[prefixFilterPairs]]). */
  case object ExactSsJoin extends SsJoinShape
  /** MinHash-LSH candidate generation + the SAME exact integer
    * verification — precision 1, recall follows the banding curve
    * 1−(1−s^r)^b on each true pair's similarity s. */
  case object LshSsJoin extends SsJoinShape

  /** Session-wide override for [[ssJoinPairsAuto]]: "exact" | "lsh". */
  val SsJoinForceKey = "spark.graft.ssjoin.force"
  /** OPT-IN escape threshold (bytes) for [[ssJoinPairsAuto]]: when set,
    * an estimated exact-verify candidate shuffle above it dispatches to
    * the LSH shape. Unset (the default) = always exact — sub-unit recall
    * is never a silent default. */
  val SsJoinLshEscapeBytesKey = "spark.graft.ssjoin.lshEscapeBytes"

  /** [[LshSsJoin]]'s materialization: MinHash-LSH candidates
    * ([[minhashCandidatePairsTracked]]) re-scored by the SAME integer
    * predicate as [[prefixFilterPairs]] (inter·den ≥ num·union over
    * distinct-gram sets), emitting the SAME output contract
    * (doc_a < doc_b, inter, union_sz, jaccard — bit-identical values on
    * every emitted pair, since both shapes count set identities under
    * the same xxhash64 gram bijection and round with the same
    * expression). What differs is COVERAGE: only pairs that collide in
    * ≥1 of the b bands appear, so recall on a true pair at similarity s
    * is 1−(1−s^r)^b — the banding curve; precision stays 1. Defaults
    * (k=32 — the native minhash_sig ceiling — r=4 → b=8) give ~0.40
    * recall AT a 0.5 threshold and ≥0.95 at s ≥ 0.75; lower
    * `rowsPerBand` to raise recall at the cost of more candidates
    * (r=1 → miss probability (1−s)^32 ≤ 2⁻³² at s ≥ 0.5, but every
    * pair sharing ONE minhash becomes a candidate — the dial trades
    * candidate volume, which is the very thing the escape bounds).
    * Scale: candidates form only inside band buckets
    * (never the n²/V exact-prefix pair space this shape escapes), and
    * verification tokenizes only candidate-incident docs. */
  private[graft] def lshVerifiedPairs(docs: DataFrame, idCol: String,
      textCol: String, thrNum: Int, thrDen: Int, shingleN: Int,
      k: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    val (cands, candBlocks) = minhashCandidatePairsTracked(
      docs, idCol, textCol, shingleN, k, rowsPerBand, maxBucket)
    // shingle ONLY candidate-incident docs (the nearDupPairsFrom shape):
    // per-token hash work scales with candidate density, not the corpus
    val candIds = cands.select(col("doc_a").as("id"))
      .union(cands.select(col("doc_b").as("id")))
      .distinct()
    val sets = docs.select(col(idCol).as("id"), col(textCol))
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"),
        sort_array(shingleHashSet(col(textCol), shingleN)).as("tk"))
    val out = Checkpoints.output(cands
      .join(sets.select(col("id").as("doc_a"), col("tk").as("tk_a")), Seq("doc_a"))
      .join(sets.select(col("id").as("doc_b"), col("tk").as("tk_b")), Seq("doc_b"))
      .withColumn("sz_a", size(col("tk_a")))
      .withColumn("sz_b", size(col("tk_b")))
      .withColumn("inter",
        graft.functions.SortedIntersect.sorted_intersect_count(col("tk_a"), col("tk_b")))
      .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * thrDen >= col("union_sz") * thrNum)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        col("inter"), col("union_sz"),
        graft.ops.CoreOps.roundPortable(
          col("inter").cast("double") / col("union_sz").cast("double"), 6).as("jaccard")))
    Checkpoints.release(candBlocks)
    out
  }

  /** Stat-driven set-similarity join (the q142 escape, productized —
    * VERDICT r14 item 3's "ideally"): [[prefixFilterPairs]] while the
    * estimated candidate shuffle stays tractable, the LSH-verified shape
    * ([[lshVerifiedPairs]]) once the exact join enters the pair-bound
    * regime — IF the caller opted in. Selection ladder, mirroring
    * [[graft.ops.ShapeDispatch]]:
    *
    *  1. per-call `force`;
    *  2. session conf `spark.graft.ssjoin.force` = "exact" | "lsh";
    *  3. `spark.graft.ssjoin.lshEscapeBytes` UNSET → always exact (the
    *     warn/hard-cap guards in [[prefixFilterPairs]] still apply);
    *  4. set → build the prefix structures once, estimate the verify
    *     shuffle on the SAME numbers the guard uses ([[planVerify]]:
    *     Σ c·(c−1)/2 over prefix buckets × the shape's per-pair bytes);
    *     above the threshold, release the prefix checkpoints and take
    *     the LSH shape; otherwise continue into the exact verification
    *     with nothing recomputed.
    *
    * The RECALL CONTRACT when the escape fires: precision stays 1 (the
    * verification is the same integer arithmetic), recall on a true pair
    * at similarity s drops to the banding curve 1−(1−s^r)^b. That loss
    * is deliberate and opt-in — at the corpus sizes that trigger the
    * escape, the exact join's candidate space is ~n²/V and no filter
    * ladder changes the asymptote (the r14 sf4 grid measured it filling
    * the disk); a bounded-recall answer that completes beats an exact
    * one that does not. Callers needing exactness at that scale shrink
    * the corpus first (exact dedup / span dedup), then run exact. */
  def ssJoinPairsAuto(docs: DataFrame, idCol: String, textCol: String,
                      thrNum: Int, thrDen: Int, shingleN: Int = 1,
                      force: Option[SsJoinShape] = None,
                      broadcastVerify: Option[Boolean] = None,
                      lshK: Int = 32, lshRowsPerBand: Int = 4,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    val conf = docs.sparkSession.conf
    // an unrecognized force value fails loud (r15 ADVICE): a user who
    // typo'd "LSH" believes they forced a shape — silently taking the
    // auto ladder instead is the one outcome they explicitly ruled out
    val chosen = force.orElse(conf.getOption(SsJoinForceKey).map {
      case "exact" => ExactSsJoin
      case "lsh"   => LshSsJoin
      case other => throw new IllegalArgumentException(
        s"$SsJoinForceKey: unknown value '$other' (valid: exact | lsh)")
    })
    def lshShape(): DataFrame = lshVerifiedPairs(docs, idCol, textCol,
      thrNum, thrDen, shingleN, lshK, lshRowsPerBand, maxBucket)
    chosen match {
      case Some(ExactSsJoin) =>
        prefixFilterPairs(docs, idCol, textCol, thrNum, thrDen, shingleN,
          broadcastVerify = broadcastVerify)
      case Some(LshSsJoin) => lshShape()
      case None =>
        conf.getOption(SsJoinLshEscapeBytesKey).map(_.toLong) match {
          case None => // escape not opted into: exact, unconditionally
            prefixFilterPairs(docs, idCol, textCol, thrNum, thrDen, shingleN,
              broadcastVerify = broadcastVerify)
          case Some(escapeBytes) =>
            val (cands, stoks, prefix, blocks) = prefixCandidates(
              docs, idCol, textCol, thrNum, thrDen, shingleN,
              suffixFilter = false, suffixDepth = 1)
            val vp = planVerify(stoks, prefix, broadcastVerify)
            if (vp.estShuffle > escapeBytes) {
              Checkpoints.release(blocks)
              org.slf4j.LoggerFactory.getLogger(getClass).info(
                f"ssJoinPairsAuto: estimated exact-verify shuffle " +
                  f"${vp.estShuffle}%.3g B (~${vp.estPairs}%.3g candidate " +
                  f"pairs) exceeds $SsJoinLshEscapeBytesKey=$escapeBytes — " +
                  s"dispatching to the LSH shape (k=$lshK, r=$lshRowsPerBand; " +
                  "precision 1, recall per the banding curve)")
              lshShape()
            } else {
              verifyPrefixCandidates(cands, stoks, prefix, blocks,
                thrNum, thrDen, broadcastVerify, Some(vp))
            }
        }
    }
  }

  /** Candidate generation for [[prefixFilterPairs]], split out so the
    * pruning power of each filter level is countable (Round9Spec's
    * Zipf-fixture measurement). Returns (candidates, per-doc sorted
    * token-rank arrays, the checkpointed per-doc prefix-token frame —
    * the pair-space guard's input — and checkpoint blocks, which the
    * caller releases after the last consumer).
    *
    * Filter ladder, every level LOSSLESS for J ≥ thrNum/thrDen:
    *   1. length filter — min·den ≥ max·num;
    *   2. PPJoin positional filter — the smallest common token of a true
    *      pair sits in both prefixes at ranks (i, j) and every other
    *      common token follows it in both docs, so
    *      overlap ≤ 1 + min(szₐ−i, sz_b−j); required overlap is
    *      α = ⌈num·(szₐ+sz_b)/(num+den)⌉. Min-ranks per pair only
    *      over-estimate the bound — never drop a true pair;
    *   3. PPJoin+ SUFFIX filter (Xiao et al. TODS'11 §4.2, one level) —
    *      all common tokens lie in the rank-windows a[ia..szₐ],
    *      b[ib..sz_b] of the GLOBAL (df, th) token order; partitioning
    *      both windows at a's middle token m bounds the overlap by
    *      min(left sizes) + min(right sizes). The probe into b is one
    *      O(log sz) binary search ([[graft.functions.SortedSearch]]),
    *      paid per candidate PAIR — the verification intersect it
    *      replaces walks both full arrays.
    *
    * The global token order materializes as `tokid` = rank of (df, th)
    * via [[graft.ops.CoreOps.globalRowNumber]] (range-partitioned — the
    * vocabulary never sorts in one task), and each doc stores its tokens
    * as the ASCENDING tokid array `stoks`, which triple-serves as prefix
    * source, suffix-probe target and verification array.
    */
  private[graft] def prefixCandidates(docs: DataFrame, idCol: String, textCol: String,
                                      thrNum: Int, thrDen: Int, shingleN: Int,
                                      suffixFilter: Boolean,
                                      suffixDepth: Int = 1)
      : (DataFrame, DataFrame, DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    require(thrNum > 0 && thrDen > 0 && thrNum <= thrDen,
      s"threshold must be a fraction in (0,1]: $thrNum/$thrDen")
    require(suffixDepth == 1 || suffixDepth == 2,
      s"suffixDepth must be 1 or 2, got $suffixDepth")
    // base feeds dfreq, the rank window and (suffix off) verification —
    // checkpoint once or the shingle+hash pipeline recomputes per consumer
    val (base, baseBlocks) = Checkpoints.tracked(
      docs.select(col(idCol).as("id"),
          sort_array(shingleHashSet(col(textCol), shingleN)).as("ths"))
        .withColumn("sz", size(col("ths")))
        .filter(col("sz") > 0)
        .select(col("id"), col("sz"), col("ths")))
    val tok = base.select(col("id"), col("sz"), explode(col("ths")).as("th"))
    // tok holds DISTINCT (id, gram) pairs, so count == document frequency
    // (collisions merge gram identities — candidates only grow)
    val dfreq = tok.groupBy("th").agg(count(lit(1)).as("df"))
    // The suffix filter needs a MATERIALIZED global token rank (tokid) so
    // per-doc arrays binary-search consistently; without it the (df, th)
    // window order serves directly and the vocabulary never globally
    // sorts. The setup is the filter's price of admission — only pay it
    // when candidate density warrants (see [[prefixFilterPairs]] doc).
    val ranked =
      if (suffixFilter) {
        val vocab = graft.ops.CoreOps.globalRowNumber(dfreq, Seq("df", "th"),
          rankCol = "tokid")
        tok.join(vocab.select("th", "tokid"), Seq("th"))
          .withColumn("rk",
            row_number().over(Window.partitionBy("id").orderBy(asc("tokid"))))
      } else
        tok.join(dfreq, Seq("th"))
          .withColumn("tokid", col("th"))
          .withColumn("rk",
            row_number().over(Window.partitionBy("id").orderBy(asc("df"), asc("th"))))
    // stoks is read by the suffix probe AND both verification joins.
    // With the filter on it is the tokid arrays (own checkpoint); off, it
    // is just `base`'s gram hashes renamed — same blocks, no new
    // materialization. Both shapes are sorted ascending (tokid arrays by
    // array_sort, gram hashes at base build), the contract the native
    // merge-intersection verification relies on.
    val (stoks, stoksBlocks) =
      if (suffixFilter)
        Checkpoints.tracked(ranked
          .groupBy(col("id"), col("sz"))
          .agg(array_sort(collect_list(col("tokid"))).as("stoks")))
      else
        (base.select(col("id"), col("sz"), col("ths").as("stoks")),
          Seq.empty[org.apache.spark.rdd.RDD[_]])
    // prefix length = sz − ⌈num·sz/den⌉ + 1, all integer
    val (prefix, prefixBlocks) = Checkpoints.tracked(ranked
      .filter(col("rk") <= col("sz") - expr(s"($thrNum * sz + ${thrDen - 1}) DIV $thrDen") + 1)
      .select(col("id"), col("tokid"), col("sz"), col("rk")))
    // ASYMMETRIC (indexing) prefix — PPJoin's index-side tightening
    // (Xiao et al. TODS'11 §3.1): orient each pair so side a is the
    // SIZE-SMALLER record ((sz, id) lexicographic for antisymmetry).
    // Its partner b has sz_b ≥ sz_a, so the required overlap
    // α = ⌈t/(1+t)·(szₐ+sz_b)⌉ ≥ ⌈2t/(1+t)·szₐ⌉, and a needs only its
    // first szₐ − ⌈2t/(1+t)·szₐ⌉ + 1 tokens in the join (prefix lemma
    // with the larger α; the probe side keeps the standard length, whose
    // α ≥ t·sz_b needs the length filter every true pair passes). At
    // t = 1/2 this is ~sz/3 vs ~sz/2 — candidates drop ~1/3 on ANY
    // corpus, and the r11 sf1 measurement is where it pays: the
    // fixed-vocab corpus saturates its gram space and candidates are
    // the whole cost (19.6M at 50k docs). Lossless: both prefixes only
    // LENGTHEN relative to the α-exact lemma bound, and the first
    // common token of a surviving pair is still observed (any globally
    // earlier common token has smaller rank in BOTH docs, hence sits in
    // both generation prefixes), so the positional min-ranks stay exact.
    val idxPrefix = prefix.filter(col("rk") <=
      col("sz") - expr(s"(2 * $thrNum * sz + ${thrNum + thrDen - 1}) DIV ${thrNum + thrDen}") + 1)
    val positional = idxPrefix.as("a").join(prefix.as("b"),
        col("a.tokid") === col("b.tokid") &&
        (col("a.sz") < col("b.sz") ||
          (col("a.sz") === col("b.sz") && col("a.id") < col("b.id"))))
      .filter(col("a.sz") * thrDen >= col("b.sz") * thrNum)
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(min(col("a.rk")).as("__ia"), min(col("b.rk")).as("__ib"),
        first(col("a.sz")).as("__sza"), first(col("b.sz")).as("__szb"))
      .filter(lit(1) + least(col("__sza") - col("__ia"), col("__szb") - col("__ib")) >=
        expr(s"($thrNum * (__sza + __szb) + ${thrNum + thrDen - 1}) DIV ${thrNum + thrDen}"))
    val cands =
      if (!suffixFilter) positional.select(col("doc_a"), col("doc_b"))
      else {
        val alpha = expr(s"($thrNum * (__sza + __szb) + ${thrNum + thrDen - 1}) DIV ${thrNum + thrDen}")
        // pivot = a's middle window token; both windows split at its
        // VALUE, so left parts share at most min(left sizes), right parts
        // min(right sizes) — an upper bound on the true overlap. The
        // per-doc arrays are sorted ascending with distinct values, so
        // a's rank slices ARE its value intervals.
        val pa = expr("(__ia + __sza) DIV 2")
        val base2 = positional
          .join(stoks.select(col("id").as("doc_a"), col("stoks").as("__sa")), Seq("doc_a"))
          .join(stoks.select(col("id").as("doc_b"), col("stoks").as("__sb")), Seq("doc_b"))
          .withColumn("__pa", pa)
          .withColumn("__m", element_at(col("__sa"), col("__pa").cast("int")))
          .withColumn("__lb", graft.functions.SortedSearch.sorted_count_less_from(
            col("__sb"), col("__ib").cast("int"), col("__m")))
        val filtered =
          if (suffixDepth == 1)
            base2.filter(
              least(col("__pa") - col("__ia"), col("__lb")) +
              least(col("__sza") - col("__pa") + 1,
                (col("__szb") - col("__ib") + 1) - col("__lb")) >= alpha)
          else {
            // SECOND recursion level (Xiao et al. §4.2, maxdepth 2):
            // re-split each half at ITS OWN middle pivot — the value
            // partition refines to four intervals (−∞,m₁), [m₁,m),
            // [m,m₂), [m₂,∞), and the overlap bound Σ min(part sizes)
            // can only TIGHTEN (min(x+y, u+v) ≥ min(x,u) + min(y,v)),
            // so depth 2 subsumes the level-1 filter and stays lossless
            // by the same partition argument. Cost per pair: two more
            // element_at pivots + two more O(log sz) binary searches —
            // b's < m elements occupy positions [ib, ib+lb), so the
            // right-half probe starts at ib+lb.
            base2
              .withColumn("__pa1", expr("(__ia + __pa) DIV 2"))
              .withColumn("__pa2", expr("(__pa + __sza) DIV 2"))
              .withColumn("__m1", element_at(col("__sa"), col("__pa1").cast("int")))
              .withColumn("__m2", element_at(col("__sa"), col("__pa2").cast("int")))
              .withColumn("__lb1", graft.functions.SortedSearch.sorted_count_less_from(
                col("__sb"), col("__ib").cast("int"), col("__m1")))
              .withColumn("__rb1", graft.functions.SortedSearch.sorted_count_less_from(
                col("__sb"), (col("__ib") + col("__lb")).cast("int"), col("__m2")))
              .filter(
                least(col("__pa1") - col("__ia"), col("__lb1")) +
                least(col("__pa") - col("__pa1"), col("__lb") - col("__lb1")) +
                least(col("__pa2") - col("__pa"), col("__rb1")) +
                least(col("__sza") - col("__pa2") + 1,
                  (col("__szb") - col("__ib") + 1) - col("__lb") - col("__rb1")) >= alpha)
          }
        filtered.select(col("doc_a"), col("doc_b"))
      }
    (cands, stoks, prefix, baseBlocks ++ stoksBlocks ++ prefixBlocks)
  }

  /** Sorted-neighborhood (SNM) near-dup pairs — the third blocking
    * paradigm beside LSH (probabilistic, q19) and prefix filtering
    * (exact, q142): sort the corpus ONCE by a cheap blocking key (the
    * first three tokens), then verify only pairs within `w` positions of
    * each other in the global order. Classic record-linkage; recall is
    * heuristic by design (a true pair sorting far apart is missed), but
    * the contract — "the verified pairs within the window" — is exact
    * and fully replayable, and the work is O(n·w) verifications after
    * one sort, with no pair space at all.
    *
    * Scale: the global order comes from
    * [[graft.ops.CoreOps.globalRowNumber]] (range partition + offsets);
    * window pairing is an EQUI-join on the rank-bucket ⌊rank/w⌋ (each
    * row posts to its own and the next bucket — any pair within w ranks
    * shares a posted bucket), so no window function ever walks the
    * corpus. Verification intersects hashed 3-gram arrays (the q142
    * convention, same collision note).
    */
  def sortedNeighborPairs(docs: DataFrame, idCol: String, textCol: String,
                          w: Int = 8, thrNum: Int = 1, thrDen: Int = 2): DataFrame = {
    require(w >= 2, "window must cover at least adjacent pairs")
    val sets = docs.select(col(idCol).cast("long").as("id"),
      concat_ws(" ", slice(TextOps.tokens(lower(col(textCol))), 1, 3)).as("sort_key"),
      sort_array(shingleHashSet(col(textCol), 3)).as("ths"))
      .withColumn("sz", size(col("ths")))
      .filter(col("sz") > 0)
      .select(col("id"), col("sort_key"), col("sz"), col("ths"))
    // globalRowNumber's checkpoint materializes the RANGE PARTITIONING,
    // but its window+offset-join suffix re-executes per reference — and
    // the bucket join reads the ranked frame on BOTH sides. Checkpoint
    // the ranked+bucketed frame once so each side scans the materialized
    // rows instead of re-sorting the corpus (with its gram arrays) twice.
    val (withB, wbBlocks) = Checkpoints.tracked(
      graft.ops.CoreOps.globalRowNumber(sets, Seq("sort_key", "id"), rankCol = "rank")
        .withColumn("b", expr(s"rank DIV $w")))
    val posted = withB.select(col("id"), col("rank"), col("sz"), col("ths"),
      explode(array(col("b"), col("b") + 1)).as("jb"))
    val cands = posted.as("a").join(withB.as("c"), col("a.jb") === col("c.b"))
      .filter(col("c.rank") > col("a.rank") && col("c.rank") - col("a.rank") < w)
      .select(col("a.id").as("doc_a"), col("c.id").as("doc_b"),
        col("a.sz").as("sz_a"), col("c.sz").as("sz_b"),
        col("a.ths").as("tk_a"), col("c.ths").as("tk_b"))
    val out = Checkpoints.output(cands
      // length filter first: J ≥ t needs min·den ≥ max·num — prunes
      // mismatched-size neighbors before any array intersection
      .filter(least(col("sz_a"), col("sz_b")) * thrDen >=
              greatest(col("sz_a"), col("sz_b")) * thrNum)
      .withColumn("inter",
        graft.functions.SortedIntersect.sorted_intersect_count(col("tk_a"), col("tk_b")))
      .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * thrDen >= col("union_sz") * thrNum)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        col("inter"), col("union_sz"),
        graft.ops.CoreOps.roundPortable(
          col("inter").cast("double") / col("union_sz").cast("double"), 6).as("jaccard")))
    Checkpoints.release(wbBlocks)
    out
  }

  /** Jaccard similarity of two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union === 0, lit(0.0)).otherwise(inter / union.cast("double"))
  }

  /** [[jaccard]] over ASCENDING-sorted distinct `array<long>` sets — the
    * native two-pointer merge ([[graft.functions.SortedIntersectCount]])
    * instead of `array_intersect`'s per-pair hash-set build. Same value
    * whenever the sortedness contract holds; callers establish it once
    * per document (`sort_array` at set build), then every candidate pair
    * the document participates in rides the allocation-free merge.
    */
  def sortedJaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.SortedIntersect.sorted_intersect_count(a, b)
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0))
      .otherwise(inter.cast("double") / union.cast("double"))
  }

  /** SimHash-64: per token, md5 → first 8 digest bytes → 64-bit int; each
    * bit votes ±1; sign of the vote sum sets the output bit. Near-dup docs
    * land within small Hamming distance. Implemented as the native
    * [[graft.functions.SimHash64]] expression — one md5 pass per token with
    * in-loop bit votes, a pure projection (no shuffle).
    */
  def simhash64(text: Column): Column =
    graft.functions.SimHash64.simhash64(TextOps.tokens(lower(text)))

  /** Hamming distance between two simhash-64 values. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs: banded candidate generation + exact
    * hamming verification. The 64-bit simhash splits into four 16-bit
    * bands; by pigeonhole any pair within hamming distance ≤ 3 agrees on
    * at least one whole band, so the band equi-join has EXACT recall for
    * maxHamming ≤ 3 while only expanding pairs inside band buckets — the
    * same never-form-the-pair-space shape as MinHash LSH. Shift is
    * arithmetic + mask (identical to a logical shift once masked), which
    * both engines spell the same way.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxHamming <= 3, "4 bands give exact recall only for hamming <= 3")
    // One simhash pass, one shuffle on (band, key), in-bucket pair
    // expansion — the same single-aggregation shape as
    // minhashCandidatePairs, NOT a bucket self-join (which reads the
    // simhash projection twice and historically leaked a persisted frame
    // per invocation). Buckets group docs agreeing on one 16-bit band:
    // tiny when the corpus is clean, and the (doc_id, h) structs they
    // collect are 16 bytes/doc. A degenerate band value (boilerplate-heavy
    // corpora hash many docs to the same 16-bit band) is guarded by the
    // same triangle-block salting as the MinHash path — set maxBucket at
    // scale to bound per-task collect/expansion state.
    val banded = docs
      .select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("h"))
      .select(col("doc_id"), col("h"), explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
               shiftright(col("h"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("h"), col("bk.band"), col("bk.key"))
    val buckets = triangleBlocked(banded, Seq("band", "key"), "doc_id", maxBucket)
      .groupBy("band", "key", "__blk")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("h")))).as("ds"))
      .filter(size(col("ds")) > 1)
    // ordered pairs (ds[i], ds[j]) for i < j; structs sort by doc_id first.
    // doc_a ≤ doc_b with equality only under duplicate input ids — the
    // =!= filter below keeps the oracle's strict doc_a < doc_b semantics.
    val pairs = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + 2, size(col("ds"))),
        y => struct(x.getField("doc_id").as("doc_a"), y.getField("doc_id").as("doc_b"),
                    hamming64(x.getField("h"), y.getField("h")).as("hamming")))))
    buckets
      .select(explode(pairs).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming"))
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact duplicated-SUBSTRING-span removal — the span-granular dedup of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"): token runs that repeat ACROSS documents are excised from
    * every document carrying them, while the rest of each document
    * survives. Doc-granular dedup (exact q14, near-dup q54) misses this
    * class entirely — boilerplate headers, license blocks, quoted
    * passages — and q151's repetition gates only see WITHIN-doc repeats.
    *
    * Semantics (deterministic, RNG-free):
    *  - token stream = whitespace-split lowered text (the corpus-wide
    *    canonical form every gram operator here shares);
    *  - every w-token window of every document with ≥ w tokens gets a
    *    position; a window is DUPLICATED iff its gram occurs in at least
    *    `minDocs` DISTINCT documents (within-doc repeats alone never
    *    trigger — that is q151's axis);
    *  - a document's removed region is the UNION of its duplicated
    *    windows' [pos, pos+w−1] intervals; maximal contiguous runs are
    *    the reported spans (gaps-and-islands over window starts: a new
    *    island starts where pos > prev_pos + w);
    *  - clean_text is the surviving tokens in order, space-joined — the
    *    operator is defined on the token stream, so original whitespace
    *    is deliberately normalized.
    *
    * Scale shape (100 TB): the gram pass is ONE posexplode of the fused
    * native [[graft.functions.GramHashes]] stream (8-byte keys, no gram
    * strings — window position is the array index, so positioned grams
    * cost nothing extra); "duplicated" is a hash-aggregate whose state is
    * TWO longs per gram (min/max doc_id — min ≠ max ⟺ ≥ 2 distinct
    * docs; `minDocs` > 2 falls back to count_distinct), never a distinct
    * expansion; the mark is one equi-join on the gram key; islands ride a
    * doc_id-partitioned window (group = one document, bounded by max doc
    * length — the dual-shape rule's good case); excision is a positional
    * anti-join on (doc_id, pos) and a per-doc re-aggregation whose buffer
    * is one document's tokens. Every shuffle is keyed by gram or doc_id;
    * no driver state, no data-sized single-task stage. The decontamination
    * bloom path (q80) composes: at extreme corpus sizes, build a bloom of
    * duplicated grams and pre-filter the mark join's probe side. The
    * source is tokenized three times (gram pass, excision pass, final
    * doc-length projection) — deliberate: re-reading a columnar scan is
    * cheaper than materializing the token arrays, and the expensive gram
    * pass runs exactly once behind the span checkpoint.
    *
    * Output: doc_id, n_tokens, n_spans, n_tokens_removed, frac_removed,
    * clean_text — one row per input document (untouched docs report 0
    * spans and their full token stream; fully-duplicated docs report
    * clean_text = "").
    */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                w: Int = 8, minDocs: Int = 2): DataFrame = {
    require(w >= 2, "span windows need at least 2 tokens")
    require(minDocs >= 2, "a span must repeat across at least 2 documents")
    val tk = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(lower(col(textCol))).as("t"))
    // positioned w-windows: gram_hashes emits one hash per window IN
    // ORDER, so posexplode's index IS the (0-based) window start. Docs
    // shorter than w emit the whole-doc gram in shingleHashes' convention;
    // span semantics exclude them (nothing to excise a window from).
    val win = tk.filter(size(col("t")) >= w)
      .select(col("doc_id"),
        posexplode(graft.functions.GramHashes.gram_hashes(col("t"), w)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gh"))
    val dup =
      if (minDocs == 2)
        win.groupBy("gh")
          .agg(min(col("doc_id")).as("__d0"), max(col("doc_id")).as("__d1"))
          .filter(col("__d0") =!= col("__d1")).select("gh")
      else
        win.groupBy("gh")
          .agg(count_distinct(col("doc_id")).as("__nd"))
          .filter(col("__nd") >= minDocs).select("gh")
    val marked = win.join(dup, Seq("gh"), "left_semi").select("doc_id", "pos")
    // gaps-and-islands over window STARTS: starts are sorted per doc and
    // all windows have length w, so the union of intervals breaks exactly
    // where pos > prev_pos + w
    val wd = Window.partitionBy("doc_id").orderBy(asc("pos"))
    // spans feed TWO consumers (the per-doc stats and the excision
    // anti-join); checkpointing the tiny island frame (≤ |marked starts|
    // rows) stops the whole gram pass from running twice — the same
    // ledger-released pattern as the candidate-pair checkpoints above
    val spans = Checkpoints.output(marked
      .withColumn("__pp", lag(col("pos"), 1).over(wd))
      .withColumn("__nf",
        when(col("__pp").isNull || col("pos") > col("__pp") + w, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__nf")).over(wd))
      .groupBy("doc_id", "__island")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (w - 1)).as("e")))
    val removed = spans.select(col("doc_id"), explode(sequence(col("s"), col("e"))).as("pos"))
    val kept = tk
      .select(col("doc_id"), posexplode(col("t")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
      .join(removed, Seq("doc_id", "pos"), "left_anti")
    val clean = kept.groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        p => p.getField("tok")), " ").as("clean_text"))
    val stats = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("n_removed"))
    tk.join(stats, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_tokens_removed"),
        (coalesce(col("n_removed"), lit(0L)).cast("double")
          / size(col("t")).cast("double")).as("frac_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
