package graft.text

/** Paired expression templates — one Spark-SQL string and one DuckDB-SQL
  * string per primitive — so the engine and its oracle are generated from
  * the same source and cannot drift.
  *
  * Everything here is built on primitives with IDENTICAL semantics in both
  * engines: md5 (lowercase hex), instr (1-based), lexicographic min over
  * hex strings, sequential left-to-right list folds (verified bit-exact for
  * doubles), and regex classes both dialects share.
  */
object TextExprs {

  /** A Spark/DuckDB expression pair. */
  final case class X(spark: String, duck: String) {
    def map(f: String => String): X = X(f(spark), f(duck))
  }

  /** Whitespace tokenization of a text column. */
  def tokens(c: String): X = X(
    spark = s"split(trim($c), '\\\\s+')",
    duck = s"string_split_regex(trim($c), '\\s+')")

  /** Word 3-shingles over a token-array expression (guarded for <3 tokens:
    * the whole doc becomes the single shingle). Spark `sequence(1, n)` with
    * n<1 counts DOWN, DuckDB `range(1, n)` returns empty — the CASE guard
    * makes both sides take the same branch.
    */
  def shingles3(t: X): X = X(
    spark = s"CASE WHEN size(${t.spark}) >= 3 THEN " +
      s"transform(sequence(1, size(${t.spark}) - 2), i -> concat_ws(' ', slice(${t.spark}, i, 3))) " +
      s"ELSE array(concat_ws(' ', ${t.spark})) END",
    duck = s"CASE WHEN len(${t.duck}) >= 3 THEN " +
      s"list_transform(range(1, len(${t.duck}) - 1), i -> array_to_string(list_slice(${t.duck}, i, i + 2), ' ')) " +
      s"ELSE [array_to_string(${t.duck}, ' ')] END")

  /** md5 each element of a string-array expression — ONE digest pass per
    * shingle; the k minhash functions below derive from this single digest
    * with cheap arithmetic (classic (h1 + i·h2) mod p family) instead of k
    * separate digest passes.
    */
  def md5List(sh: String): X = X(
    spark = s"transform($sh, s -> md5(s))",
    duck = s"list_transform($sh, s -> md5(s))")

  private val P = 1000000007L

  /** Parse one 15-hex-char half of each md5 in `hs` into bigints mod p —
    * done ONCE; the k minhash functions below are pure arithmetic over
    * these numeric arrays ((h1 + i·h2) mod p family).
    */
  def hashHalf(hs: String, from: Int): X = X(
    spark = s"transform($hs, h -> CAST(conv(substring(h, $from, 15), 16, 10) AS BIGINT) % $P)",
    duck = s"list_transform($hs, h -> ('0x' || substring(h, $from, 15))::BIGINT % $P)")

  /** MinHash i from the two pre-parsed numeric halves `a1`,`a2`:
    * min over shingles of (h1 + i·h2) mod p. Bit-identical across engines
    * (64-bit int arithmetic only).
    */
  def minhash(a1: String, a2: String, seed: Int): X = X(
    spark = s"array_min(zip_with($a1, $a2, (x, y) -> (x + $seed * y) % $P))",
    duck = s"list_min(list_transform(range(1, len($a1) + 1), " +
      s"j -> ($a1[j] + $seed * $a2[j]) % $P))")

  /** One SimHash bit (position p in 1..16): majority vote over tokens of
    * the parity of hex digit p of md5(token).
    */
  def simhashBit(t: String, p: Int): X = X(
    spark = s"CASE WHEN aggregate($t, 0, (acc, x) -> acc + " +
      s"(instr('0123456789abcdef', substring(md5(x), $p, 1)) - 1) % 2) * 2 " +
      s"> size($t) THEN '1' ELSE '0' END",
    duck = s"CASE WHEN list_sum(list_transform($t, x -> " +
      s"(instr('0123456789abcdef', substring(md5(x), $p, 1)) - 1) % 2)) * 2 " +
      s"> len($t) THEN '1' ELSE '0' END")

  /** 16-bit SimHash as a bit-string. */
  def simhash16(t: String): X = {
    val bits = (1 to 16).map(simhashBit(t, _))
    X(bits.map(_.spark).mkString("concat(", ", ", ")"),
      bits.map(_.duck).mkString("concat(", ", ", ")"))
  }

  /** 64-bit SimHash from a PRE-HASHED token list `hl` (array of md5-hex
    * strings) and token count `nt`, as a BIGINT: bit p (1..64) is the
    * majority vote of bit p of each digest, where bit p lives in hex digit
    * d = ⌈p/4⌉ at shift 4d−p (big-endian), and lands at two's-complement
    * position 64−p of the signature — exactly the bit layout of
    * graft.functions.Kernels.simhash64, which the Spark side uses as a
    * one-pass kernel. p=1 is the sign bit, so its weight is spelled
    * (−MAX−1) rather than 2⁶³ (which overflows BIGINT in both dialects);
    * the remaining weights are plain powers of two, and the 64-term sum is
    * the signature in two's complement. Taking the digest list (not
    * tokens) keeps the oracle at ONE md5 evaluation per token instead of
    * 64.
    */
  def simhash64FromHashes(hl: String, nt: String): X = {
    val terms = (1 to 64).map { p =>
      val d = (p + 3) / 4
      val s = 4 * d - p
      val w = if (p == 1) "(-9223372036854775807 - 1)" else (1L << (64 - p)).toString
      X(
        spark = s"CASE WHEN aggregate($hl, 0, (acc, h) -> acc + " +
          s"shiftright(instr('0123456789abcdef', substring(h, $d, 1)) - 1, $s) % 2) * 2 " +
          s"> $nt THEN CAST($w AS BIGINT) ELSE CAST(0 AS BIGINT) END",
        duck = s"CASE WHEN list_sum(list_transform($hl, h -> " +
          s"((instr('0123456789abcdef', substring(h, $d, 1)) - 1) >> $s) % 2)) * 2 " +
          s"> $nt THEN CAST($w AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    }
    X(terms.map(_.spark).mkString("(", " + ", ")"),
      terms.map(_.duck).mkString("CAST((", " + ", ") AS BIGINT)"))
  }

  /** Rabin-Karp rolling hash at every position of a text column:
    * H(i) = Σ_{j=0..w-1} ascii(s[i-j]) · B^j  mod P — the content-defined
    * chunking primitive. Returns the 1-based positions where H(i) ≡ 0
    * (mod divisor), i.e. the chunk boundaries. Window powers are
    * precomputed constants inlined identically into both dialects.
    */
  def rollingHashBoundaries(c: String, w: Int = 8, b: Long = 257L,
                            p: Long = 1000003L, divisor: Int = 32): X = {
    val pows = (0 until w).scanLeft(1L)((acc, _) => acc * b % p).take(w)
    val pwSpark = pows.mkString("array(", "L, ", "L)")
    val pwDuck = pows.mkString("[", ", ", "]")
    X(
      spark = s"filter(transform(sequence($w, length($c)), i -> " +
        s"CASE WHEN aggregate(sequence(0, ${w - 1}), 0L, (acc, j) -> " +
        s"acc + ascii(substring($c, i - j, 1)) * element_at($pwSpark, j + 1)) % $p % $divisor = 0 " +
        s"THEN i ELSE -1 END), x -> x > 0)",
      duck = s"list_filter(list_transform(range($w, length($c) + 1), i -> " +
        s"CASE WHEN list_sum(list_transform(range(0, $w), j -> " +
        s"ascii(substring($c, CAST(i - j AS INTEGER), 1)) * ($pwDuck)[j + 1])) % $p % $divisor = 0 " +
        s"THEN i ELSE -1 END), x -> x > 0)")
  }

  /** Count of tokens drawn from a marker set (language-ID scoring). */
  def markerCount(t: String, markers: Seq[String]): X = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    X(spark = s"size(filter($t, x -> x IN ($set)))",
      duck = s"len(list_filter($t, x -> x IN ($set)))")
  }

  /** Count of tokens matching a regex (contains-match semantics in both
    * engines — Spark `rlike` and DuckDB `regexp_matches` both test for a
    * match anywhere in the string; anchor with ^$ for whole-token tests).
    * The regex must stay inside the character classes both dialects parse
    * identically (no lookaround, no \\d shorthands).
    */
  def regexCount(t: String, re: String): X = X(
    spark = s"size(filter($t, x -> x rlike '$re'))",
    duck = s"len(list_filter($t, x -> regexp_matches(x, '$re')))")

  /** Sum of token lengths (for mean token length). */
  def tokenLenSum(t: String): X = X(
    spark = s"aggregate($t, 0, (a, x) -> a + length(x))",
    duck = s"CAST(list_sum(list_transform($t, x -> length(x))) AS INTEGER)")

  /** Distinct-element count of an array expression. */
  def distinctCount(t: String): X = X(
    spark = s"size(array_distinct($t))",
    duck = s"len(list_distinct($t))")

  /** Intersection size of two DISTINCT array expressions — spelled as a
    * filter/contains scan in both engines so dedup behavior can't differ.
    */
  def interCount(a: String, b: String): X = X(
    spark = s"size(filter($a, x -> array_contains($b, x)))",
    duck = s"len(list_filter($a, x -> list_contains($b, x)))")

  /** Dot product of two float-vector columns, accumulated strictly
    * left-to-right in double (verified bit-identical across engines).
    */
  def dot(a: String, b: String, dim: Int = 64): X = X(
    spark = s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (s, v) -> s + v)",
    duck = s"list_sum(list_transform(generate_series(1, $dim), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))")

  /** One random-hyperplane LSH bit: sign of <v, s_j> where s_j's components
    * are ±1 derived from md5 parity of (seed_j, i) — a deterministic,
    * engine-agnostic pseudo-random plane.
    */
  def lshBit(v: String, j: Int, dim: Int = 64): X = X(
    spark = s"CASE WHEN aggregate(zip_with($v, transform(sequence(1, $dim), i -> " +
      s"CAST((instr('0123456789abcdef', substring(md5(concat('$j', '_', i)), 1, 1)) - 1) % 2 * 2 - 1 AS DOUBLE)), " +
      s"(x, w) -> CAST(x AS DOUBLE) * w), CAST(0 AS DOUBLE), (s, v2) -> s + v2) >= 0 THEN '1' ELSE '0' END",
    duck = s"CASE WHEN list_sum(list_transform(generate_series(1, $dim), i -> " +
      s"$v[i]::DOUBLE * ((instr('0123456789abcdef', substring(md5(concat('$j', '_', i)), 1, 1)) - 1) % 2 * 2 - 1)::DOUBLE)) " +
      s">= 0 THEN '1' ELSE '0' END")

  /** nBits-bit hyperplane bucket signature. */
  def lshBucket(v: String, nBits: Int, dim: Int = 64): X = {
    val bits = (0 until nBits).map(lshBit(v, _, dim))
    X(bits.map(_.spark).mkString("concat(", ", ", ")"),
      bits.map(_.duck).mkString("concat(", ", ", ")"))
  }

  /** Luhn checksum validity of a NON-EMPTY decimal-digit string
    * expression, as a boolean: positions count from the right, every
    * second digit doubled with the classic 9-subtraction, sum ≡ 0 mod 10.
    * Pure integer fold over the digits — no transcendental, no float.
    * (Spark `sequence(1, n)` counts DOWN for n<1, so callers must
    * guarantee a non-empty string — ours are lpad'ed to fixed width.)
    */
  def luhnValid(c: String): X = {
    def digit(sub: String) = s"instr('0123456789', $sub) - 1"
    val dS = digit(s"substring($c, length($c) - i + 1, 1)")
    val dD = digit(s"substring($c, CAST(length($c) - i + 1 AS INTEGER), 1)")
    X(
      spark = s"aggregate(sequence(1, length($c)), 0, (acc, i) -> acc + " +
        s"CASE WHEN i % 2 = 1 THEN $dS " +
        s"ELSE ($dS) * 2 - CASE WHEN $dS > 4 THEN 9 ELSE 0 END END) % 10 = 0",
      duck = s"list_sum(list_transform(range(1, length($c) + 1), i -> " +
        s"CASE WHEN i % 2 = 1 THEN $dD " +
        s"ELSE ($dD) * 2 - CASE WHEN $dD > 4 THEN 9 ELSE 0 END END)) % 10 = 0")
  }

  // ---------------------------------------------------- curation primitives

  /** Deterministic sampling hash: first 4 hex chars of md5 of the decimal
    * rendering of an integer id — a uniform draw from 65,536 buckets that
    * both engines spell identically (lowercase hex, lexicographic compare
    * over '0'..'f' is numeric compare). `hash < '2000'` keeps 1/8, etc.
    */
  def sampleHash(id: String): X = X(
    spark = s"substring(md5(CAST($id AS STRING)), 1, 4)",
    duck = s"substring(md5(CAST($id AS VARCHAR)), 1, 4)")

  /** Full-range 60-bit hash of a string: the first 15 hex chars of its md5
    * parsed as a BIGINT in [0, 2⁶⁰) — NO mod-p reduction (unlike hashHalf),
    * so k-minimum-values cardinality estimation can treat it as a uniform
    * draw from an exactly known range (16¹⁵ = 2⁶⁰).
    */
  def hash60(s: String): X = X(
    spark = s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT)",
    duck = s"('0x' || substring(md5($s), 1, 15))::BIGINT")

  /** Duplicate-element fraction of an array: 1 − distinct/total (a Gopher/
    * C4-style repetition signal when applied to tokens or n-grams).
    */
  def dupFraction(t: X): X = X(
    spark = s"CAST(1 AS DOUBLE) - CAST(size(array_distinct(${t.spark})) AS DOUBLE) / CAST(size(${t.spark}) AS DOUBLE)",
    duck = s"CAST(1 AS DOUBLE) - CAST(len(list_distinct(${t.duck})) AS DOUBLE) / CAST(len(${t.duck}) AS DOUBLE)")

  /** Fraction of the array taken by its single most frequent element —
    * computed as a per-row array fold (distinct × membership scan), so it
    * stays a zero-shuffle projection; per-doc cost is O(len·distinct),
    * bounded by document length.
    */
  def topElemFraction(t: X): X = X(
    spark = s"CAST(array_max(transform(array_distinct(${t.spark}), " +
      s"x -> size(filter(${t.spark}, y -> y = x)))) AS DOUBLE) / CAST(size(${t.spark}) AS DOUBLE)",
    duck = s"CAST(list_max(list_transform(list_distinct(${t.duck}), " +
      s"x -> len(list_filter(${t.duck}, y -> y = x)))) AS DOUBLE) / CAST(len(${t.duck}) AS DOUBLE)")
}
