package graft.crawl

import graft.expressions.ExprOps

/** Deterministic toy image codec for the simulated fetch stage.
  *
  * Real image decode libraries aren't in this container (builder brief),
  * so the *codec* is a clearly-marked deterministic fake, while all the
  * Spark-side plumbing around it — binary column, typed schema, per-row
  * invariants, partitioning — is real and tested. The payload honors the
  * BASELINE.json input_hint invariants:
  *  - lossless ("png"): decode returns the source pixels bit-exactly;
  *  - lossy ("jpg"): 1-LSB quantization → max per-pixel error 1 →
  *    PSNR ≥ 20·log10(255/1) ≈ 48.1dB even in the worst case (every
  *    pixel odd), so an uncorrupted lossy payload can NEVER fall under
  *    the validated 40dB floor — the engine's per-row validation agrees
  *    with the simulator's status table by construction, not by seed
  *    luck (the earlier 2-LSB quantizer had a 38.6dB worst case below
  *    the floor);
  *  - caption carried verbatim (exact equality check).
  *
  * Wire format: [magic 'G', fmt(1), w(2), h(2), pixels(w*h)] — grayscale.
  */
object ImageCodec {

  val Magic: Byte = 'G'
  val FmtPng: Byte = 0
  val FmtJpg: Byte = 1

  /** Deterministic pseudo-random grayscale pixels from a 64-bit key
    * (splitmix-style chain — identical on every executor/cluster size). */
  def pixels(key: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var state = ExprOps.mix(key ^ 0x6a09e667f3bcc908L)
    var i = 0
    while (i < out.length) {
      if ((i & 7) == 0) state = ExprOps.mix(state + 0x9e3779b97f4a7c15L)
      out(i) = ((state >>> ((i & 7) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  def encode(px: Array[Byte], w: Int, h: Int, fmt: String): Array[Byte] = {
    val body = fmt match {
      case "png" => px
      case "jpg" => px.map(b => (b & 0xfe).toByte) // drop 1 LSB (lossy; worst-case PSNR 48.1dB > 40dB floor)
      case other => throw new IllegalArgumentException(s"fmt $other")
    }
    val out = new Array[Byte](6 + body.length)
    out(0) = Magic
    out(1) = if (fmt == "png") FmtPng else FmtJpg
    out(2) = (w >> 8).toByte; out(3) = w.toByte
    out(4) = (h >> 8).toByte; out(5) = h.toByte
    System.arraycopy(body, 0, out, 6, body.length)
    out
  }

  /** Decode → (w, h, fmt, pixels); None if corrupt/undecodable. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, String, Array[Byte])] = {
    if (bytes == null || bytes.length < 6 || bytes(0) != Magic) return None
    val fmt = bytes(1) match {
      case FmtPng => "png"; case FmtJpg => "jpg"; case _ => return None
    }
    val w = ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val h = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    if (bytes.length != 6 + w * h) return None
    Some((w, h, fmt, java.util.Arrays.copyOfRange(bytes, 6, bytes.length)))
  }

  /** Peak signal-to-noise ratio between two equal-length pixel arrays.
    * Identical arrays → Double.PositiveInfinity. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length && a.length > 0)
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = ((a(i) & 0xff) - (b(i) & 0xff)).toDouble
      se += d * d
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 20.0 * math.log10(255.0 / math.sqrt(se / a.length))
  }

  /** 64-bit average-hash: 8×8 block means thresholded against the global
    * mean — the dedup-grade perceptual hash for the phash column. */
  def phash(px: Array[Byte], w: Int, h: Int): Long = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = math.min(7, y * 8 / math.max(1, h))
      var x = 0
      while (x < w) {
        val bx = math.min(7, x * 8 / math.max(1, w))
        val b = by * 8 + bx
        sums(b) += (px(y * w + x) & 0xff)
        counts(b) += 1
        x += 1
      }
      y += 1
    }
    var total = 0.0; var nb = 0
    val means = new Array[Double](64)
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) { means(i) = sums(i).toDouble / counts(i); total += means(i); nb += 1 }
      i += 1
    }
    val avg = if (nb == 0) 0.0 else total / nb
    var out = 0L
    i = 0
    while (i < 64) {
      if (counts(i) > 0 && means(i) > avg) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** Deterministic per-URL fetch outcomes — shared verbatim by the engine
  * ([[Fetch]]) and the single-threaded oracle ([[Simulator]]) so traces
  * are comparable. Outcome depends on (url_hash, epoch): a URL that fails
  * in epoch e usually succeeds when retried in e+1 (the reference's
  * 1-hour retry window, repository/JpaLegalDocumentRepository.java:75-76,
  * re-expressed as next-epoch eligibility). */
object Outcomes {
  /** ~0.5% oversize-REJECTED (terminal), ~2% transient FAILED per epoch,
    * ~0.5% corrupt-payload FAILED, else PROCESSED. */
  def of(urlHash: Long, epoch: Int): String = {
    if (java.lang.Long.remainderUnsigned(ExprOps.mix(urlHash ^ 0x5bf03635L), 199L) == 0L)
      Status.Rejected
    else if (java.lang.Long.remainderUnsigned(
        ExprOps.mix(urlHash ^ (epoch.toLong * 0x9e3779b97f4a7c15L)), 50L) == 0L)
      Status.Failed
    else if (java.lang.Long.remainderUnsigned(ExprOps.mix(urlHash ^ 0x7f4a7c15L), 211L) == 0L)
      Status.Failed // corrupt payload: decode invariant violation
    else Status.Processed
  }

  /** True when the FAILED outcome is the corrupt-payload variant (the
    * engine distinguishes it by actually failing validation). */
  def isCorrupt(urlHash: Long): Boolean =
    java.lang.Long.remainderUnsigned(ExprOps.mix(urlHash ^ 0x7f4a7c15L), 211L) == 0L

  /** ~5% of wire payloads arrive gzip-wrapped (S2 transport encoding —
    * carved orthogonally to every other outcome class, so statuses and
    * engine⇄sim equivalence are untouched by the wire encoding). */
  def isGzip(urlHash: Long): Boolean =
    java.lang.Long.remainderUnsigned(ExprOps.mix(urlHash ^ 0x2f52d9a4L), 20L) == 0L

  /** True when a REJECTED row's fixture is the decompression-bomb variant
    * (absurd declared dimensions) rather than plain oversize: carves the
    * existing Rejected class in half WITHOUT changing any status, so the
    * security predicate (P19) gets exercised while engine⇄simulator
    * status equivalence is untouched. */
  def isBomb(urlHash: Long): Boolean =
    (ExprOps.mix(urlHash ^ 0x1c3a9df2L) & 1L) == 0L

  def width(contentKey: Long): Int = 8 + (java.lang.Long.remainderUnsigned(ExprOps.mix(contentKey ^ 3L), 25L)).toInt
  def height(contentKey: Long): Int = 8 + (java.lang.Long.remainderUnsigned(ExprOps.mix(contentKey ^ 4L), 25L)).toInt
  def fmt(urlHash: Long): String =
    if (java.lang.Long.remainderUnsigned(ExprOps.mix(urlHash ^ 5L), 3L) == 0L) "jpg" else "png"

  /** Content identity key: the DOCUMENT (docid), not the URL, determines
    * the served pixels — so a mirror URL ([[FrontierSynth]]'s mirror
    * fixture) serves the same image as its primary, possibly re-encoded
    * (fmt stays a per-URL property). This is what makes cross-URL image
    * dedup (c14 phash near-dup) a real operation instead of a vacuous one:
    * URL-keyed content can never produce two stored images that are alike. */
  def contentKey(docid: String): Long = {
    var h = 0x517cc1b727220a95L
    var i = 0
    while (i < docid.length) { h = ExprOps.mix(h ^ docid.charAt(i).toLong); i += 1 }
    h
  }

  /** Inverse of Fetch's image_id format `"$docid-${url_hash}%016x"`. */
  def docidOfImageId(imageId: String): String =
    imageId.substring(0, math.max(0, imageId.length - 17))
  def caption(docid: String, host: String): String =
    s"Decision document $docid published by $host"
}
