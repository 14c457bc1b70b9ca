package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (north-star
  * extension; no reference counterpart).
  *
  * Design for 100 TB:
  *  - exact dedup is a hash-groupBy on a 32-byte fingerprint — ONE shuffle
  *    of (fingerprint, id) pairs, never of document bodies;
  *  - near-dup is banded MinHash-LSH: candidate pairs come from equi-joins
  *    on band keys (shuffle keyed by tiny band hashes), NEVER an all-pairs
  *    cross join. Only candidates in the same bucket get the exact Jaccard
  *    verification.
  *  - all hashes are md5-based and fully deterministic, so results are
  *    reproducible across runs/engines (the DuckDB oracle mirrors them
  *    bit-for-bit).
  */
object Dedup {

  /** Exact dedup: keep one arbitrary row per distinct value of `cols`.
    * Plain `dropDuplicates` — Spark plans it as a hash aggregate.
    */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact dedup, canonical + deterministic: group by content fingerprint,
    * keep the row with the smallest id. Two-phase: the groupBy shuffles only
    * (fingerprint, id); the winning rows come back via a semi-join, so
    * document bodies move at most once.
    */
  def exactCanonical(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val winners = keyed.groupBy("__fp").agg(min(col(idCol)).as(idCol))
    keyed.join(winners, Seq("__fp", idCol), "left_semi").drop("__fp")
  }

  /** Word k-shingles of a text column, as a distinct set. */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    array_distinct(
      when(n < k, array()).otherwise(
        transform(sequence(lit(1), n - lit(k) + 1),
          i => concat_ws(" ", slice(toks, i, lit(k))))))
  }

  /** MinHash signature: `numHashes` values, the i-th being the minimum of
    * md5(i ++ ":" ++ shingle) over the shingle set. md5-as-hex-string min is
    * deterministic and engine-portable (no seed, no platform hash).
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleSet,
        s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** Banded LSH near-dup candidate pairs with exact Jaccard verification.
    *
    * @param numHashes total minhash functions (bands * rowsPerBand)
    * @param bands     number of LSH bands; a pair collides if ANY band's
    *                  slice of the signature matches exactly
    * @param threshold exact word-`k`-shingle Jaccard cutoff applied to the
    *                  candidates
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, one row per verified
    * near-dup pair.
    *
    * Scale shape: docs → (band_idx, band_key, id, shingles) exploded rows;
    * self-equi-join on (band_idx, band_key) generates candidates *within
    * buckets only*; `array_intersect`/`array_union` on the (small) shingle
    * sets verifies. Skew guard: gigantic buckets (near-identical boilerplate
    * clusters) are the classic hot key — cap or salt in production; here the
    * band key is 32 hex chars so collisions are genuine near-dups.
    */
  def nearDupMinhash(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), k).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sh.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_idx"),
          md5(concat_ws("|", slice(col("sig"), b * rows + lit(1), lit(rows)))).as("band_key"))))
        .as("band"))
      .select(col("id"), col("sh"), col("band.band_idx"), col("band.band_key"))
    val a = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band_idx"), col("band_key"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact n-gram Jaccard similarity for ALL pairs above a threshold —
    * the brute-force O(n²) baseline used to validate LSH recall on samples.
    * NEVER run this at corpus scale; it exists as the correctness yardstick.
    */
  def jaccardAllPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .where(size(col("sh")) > 0)
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 32-bit SimHash of the token stream, as a non-negative long.
    *
    * Per token: md5's first 8 hex digits = 32 bits; each bit votes ±1;
    * the signature bit is 1 iff the summed vote is positive. Everything is
    * integer arithmetic on hex digits (`instr` lookup), so the DuckDB oracle
    * reproduces it exactly. Near-dup = small Hamming distance; bucket by
    * signature prefix for LSH-style blocking at scale.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    // hex digit d (0..7) → integer value via position lookup
    val withDigits = (0 until 8).foldLeft(tok) { (acc, d) =>
      acc.withColumn(s"d$d",
        (instr(lit("0123456789abcdef"), substring(col("h"), d + 1, 1)) - 1).cast("int"))
    }
    // bit j lives in hex digit j/4 at weight 2^(3 - j%4); vote = 2*bit - 1
    val voteAggs = (0 until 32).map { j =>
      val digit = col(s"d${j / 4}")
      val bit = floor(digit / math.pow(2, 3 - j % 4)).cast("int") % 2
      sum(bit * 2 - 1).as(s"v$j")
    }
    val votes = withDigits.groupBy(col("id")).agg(voteAggs.head, voteAggs.tail: _*)
    val sig = (0 until 32).map { j =>
      when(col(s"v$j") > 0, lit(1L) * (1L << j)).otherwise(0L)
    }.reduce(_ + _)
    votes.select(col("id"), sig.as("simhash"))
  }

  /** Hamming distance between two simhash longs (for blocking-verified
    * near-dup joins): popcount of xor via bit_count.
    */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
