package graft.text

/** Deterministic text-analysis kernels for the training-data pipeline
  * operators (dedup, fingerprinting, language ID). Everything is seeded
  * arithmetic — no RNG state, no library hash — so results are stable
  * across Spark versions and partitionings.
  */
object TextKernels {
  /** FNV-1a 64-bit — the stable base hash. */
  def fnv1a64(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFF)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Splitmix64 — seed expander for the hash families. */
  @inline def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic sampling bucket in [0, 1e6): UNSIGNED residue of the
    * splitmix64-mixed id. Row-content-only (no RNG / partition state), so a
    * sample is reproducible across retries, repartitioning and engines —
    * the property Spark's own `sample()` (partition-index-seeded) lacks. */
  def sampleBucket(id: Long): Long =
    java.lang.Long.remainderUnsigned(splitmix64(id), 1000000L)

  def tokens(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** Character shingles of length n (with positions collapsed to a set). */
  def charShingleHashes(text: String, n: Int): Array[Long] = {
    if (text.length < n) return Array(fnv1a64(text))
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= text.length) {
      set.add(fnv1a64(text.subSequence(i, i + n)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Distinct FNV-1a hashes of word n-grams (tokens joined by one space),
    * sorted ascending. A document shorter than n tokens contributes its
    * whole token sequence as the single gram, so every document carries
    * >= 1 gram — the decontamination ratio is never 0/0. */
  def wordNgramHashes(text: String, n: Int): Array[Long] = {
    val ws = tokens(text)
    val set = new java.util.TreeSet[java.lang.Long]()
    if (ws.length <= n) {
      set.add(fnv1a64(ws.mkString(" ")))
    } else {
      var i = 0
      while (i + n <= ws.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        set.add(fnv1a64(sb))
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Gopher quality-rule stopword list (Rae et al. 2021, §A1.1). */
  private val GopherStops: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "be", "to", "of", "and", "that", "have", "with").foreach(s.add)
    s
  }

  /** Exact per-document Gopher rule counters (Rae et al. 2021, §A1.1),
    * all integers so the pass/fail thresholds reduce to cross-multiplied
    * int comparisons the oracle mirrors exactly:
    * [nWords, sumWordLen, nAlphaWords, nStopHits,
    *  nLines, nBulletLines, nEllipsisLines, nHash, nEllipsis].
    * Conventions pinned for SQL parity: words = \\s+ tokens; alpha = has
    * an ASCII letter; stop hits compare lowercased tokens; lines = '\n'
    * split KEEPING empties (DuckDB string_split); bullet = raw "- "/"* "
    * prefix (no trim — engines disagree on trim charsets); ellipsis
    * occurrences = leftmost non-overlapping "..." (≡ the replace-based
    * SQL count). */
  def gopherStats(text: String): Array[Int] = {
    val ws = tokens(text)
    var sumLen = 0
    var nAlpha = 0
    var nStop = 0
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      sumLen += w.length
      var hasAlpha = false
      var j = 0
      while (j < w.length && !hasAlpha) {
        val c = w.charAt(j)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      if (GopherStops.contains(w.toLowerCase(java.util.Locale.ROOT))) nStop += 1
      i += 1
    }
    val lines = text.split("\n", -1)
    var nBullet = 0
    var nEllLine = 0
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.startsWith("- ") || l.startsWith("* ")) nBullet += 1
      if (l.endsWith("...")) nEllLine += 1
      i += 1
    }
    var nHash = 0
    i = 0
    while (i < text.length) { if (text.charAt(i) == '#') nHash += 1; i += 1 }
    var nEll = 0
    i = text.indexOf("...")
    while (i >= 0) { nEll += 1; i = text.indexOf("...", i + 3) }
    Array(ws.length, sumLen, nAlpha, nStop,
      lines.length, nBullet, nEllLine, nHash, nEll)
  }

  /** Exact per-document repetition profile:
    * [totalWords, distinctWords, topWordCount, totalBigrams, topBigramCount].
    * Gopher-style repetition quality signals (duplicate-word fraction,
    * top-bigram fraction) derive as ratios of these integers — kept as
    * exact counts so the oracle compares int64s, not floats. */
  def repetitionStats(text: String): Array[Int] = {
    val ws = tokens(text)
    val sum = new java.util.function.BiFunction[Integer, Integer, Integer] {
      def apply(a: Integer, b: Integer): Integer = Integer.valueOf(a + b)
    }
    val wc = new java.util.HashMap[String, Integer]()
    var topW = 0
    var i = 0
    while (i < ws.length) {
      val c = wc.merge(ws(i), Integer.valueOf(1), sum)
      if (c > topW) topW = c
      i += 1
    }
    val bc = new java.util.HashMap[String, Integer]()
    var topB = 0
    i = 0
    while (i + 1 < ws.length) {
      val c = bc.merge(ws(i) + " " + ws(i + 1), Integer.valueOf(1), sum)
      if (c > topB) topB = c
      i += 1
    }
    Array(ws.length, wc.size, topW, math.max(ws.length - 1, 0), topB)
  }

  /** Count of grams (sorted distinct) present in the sorted bench array —
    * the per-row decontamination probe against a broadcast benchmark set. */
  def sortedHitCount(grams: Array[Long], bench: Array[Long]): Int = {
    var i = 0
    var hits = 0
    while (i < grams.length) {
      if (java.util.Arrays.binarySearch(bench, grams(i)) >= 0) hits += 1
      i += 1
    }
    hits
  }

  /** MinHash signature over char-n-gram shingles: k permutations via
    * (a_j·h + b_j) with odd multipliers from splitmix64 (the classic
    * Broder construction). */
  def minhash(text: String, k: Int, shingle: Int): Array[Long] = {
    val hs = charShingleHashes(text, shingle)
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < k) {
      val a = splitmix64(2 * j + 1) | 1L
      val b = splitmix64(2 * j + 2)
      var i = 0
      var mn = Long.MaxValue
      while (i < hs.length) {
        val v = a * hs(i) + b
        if (v < mn) mn = v
        i += 1
      }
      sig(j) = mn
      j += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens (Charikar bit-vote). */
  /** Hashed bag-of-words vector ("hashing trick"): per-bucket token
    * counts with bucket = UNSIGNED fnv-1a residue (h & (buckets−1),
    * `buckets` a power of two — the DSIR bucket rule). The text half of
    * the caption↔embedding alignment score (q146): counts are exact
    * integers, so int_dot against a quantized embedding is exact int64. */
  def hashEmbed(text: String, buckets: Int): Array[Long] = {
    val v = new Array[Long](buckets)
    tokens(text).foreach { t =>
      v((fnv1a64(t) & (buckets - 1)).toInt) += 1L
    }
    v
  }

  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    tokens(text).foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** (intersection, union) sizes of char-n-gram shingle sets. */
  def shingleOverlap(a: String, b: String, n: Int): (Int, Int) = {
    val sa = charShingleHashes(a, n)
    val sb = charShingleHashes(b, n)
    var i = 0; var j = 0; var inter = 0
    while (i < sa.length && j < sb.length) {
      if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) i += 1
      else j += 1
    }
    (inter, sa.length + sb.length - inter)
  }

  /** Rolling polynomial fingerprint (Rabin-style, base 257 mod 2^61−1). */
  def rollingFingerprint(text: String): Long = {
    val Mod = 2305843009213693951L // 2^61 - 1
    var h = 0L
    var i = 0
    while (i < text.length) {
      h = mulmod(h, 257L, Mod)
      h = (h + text.charAt(i)) % Mod
      i += 1
    }
    h
  }

  @inline private def mulmod(a: Long, b: Long, m: Long): Long =
    java.math.BigInteger.valueOf(a).multiply(java.math.BigInteger.valueOf(b))
      .mod(java.math.BigInteger.valueOf(m)).longValueExact()

  /** Tiny stopword-profile language ID (n-gram/stopword heuristic).
    * Profiles are public high-frequency word lists. */
  private val Profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "für"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "un", "des", "du", "pour", "dans", "que", "pas"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "una", "un", "de", "en", "que", "por", "para", "no"),
    "zh" -> Set.empty)

  def langId(text: String): String = {
    val ts = tokens(text.toLowerCase)
    if (ts.isEmpty) return "und"
    // CJK codepoint share decides zh before stopword voting
    val cjk = text.count(c => c >= 0x4E00 && c <= 0x9FFF)
    if (cjk * 4 >= text.length) return "zh"
    var best = "und"
    var bestScore = 0
    Profiles.foreach { case (lang, words) =>
      if (words.nonEmpty) {
        val score = ts.count(words.contains)
        if (score > bestScore || (score == bestScore && score > 0 && lang < best)) {
          best = lang; bestScore = score
        }
      }
    }
    if (bestScore == 0) "und" else best
  }

  /** Rademacher random-hyperplane signature of an embedding: bit b set iff
    * Σ_j round(v_j·2^20) · s_{b,j} ≥ 0, signs pseudo-random ±1 from
    * splitmix64. Components quantize to 1/2^20 units (the Ann.Scale
    * discipline) so the sum is EXACT int64 — order-free across any
    * iteration/aggregation order, and bit-replicable by a SQL oracle
    * (Math.round(double) = floor(x+0.5), spelled that way in SQL). */
  def rademacherSig(vec: Array[Double], nBits: Int, seed: Long): Long = {
    var out = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0L
      var j = 0
      while (j < vec.length) {
        val s = if ((splitmix64(seed + b * 131071L + j) & 1L) == 0L) 1L else -1L
        acc += math.round(vec(j) * 1048576.0) * s
        j += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
