package graft.crawl

import org.apache.spark.sql.Dataset

/** Simulated fetch → decode → validate stage (SURVEY.md §2.1 S4, §2.2
  * P17-P26) as a typed `mapPartitions`: in production one HTTP client per
  * partition; here a deterministic generator keyed on url_hash. The
  * validation path is real:
  *  - decode the wire bytes (well-formedness, P21 analogue);
  *  - lossy payloads must reach PSNR ≥ 40dB vs the source pixels,
  *    lossless must be bit-exact (input_hint invariant);
  *  - caption must equal the expected caption exactly;
  *  - oversize payloads are REJECTED before decode (P17, 10MB cap
  *    analogue — util/XmlSanitizer.java:53-54);
  * violations land as FAILED with the status machine of
  * model/LegalDocument.java:129-131.
  */
object Fetch {

  val PsnrFloorDb = 40.0

  def fetch(admitted: Dataset[AdmittedUrl], epoch: Int): Dataset[FetchResult] = {
    val spark = admitted.sparkSession
    import spark.implicits._
    admitted.mapPartitions { rows =>
      rows.map { a =>
        val outcome = Outcomes.of(a.url_hash, epoch)
        val imageId = f"${a.docid}%s-${a.url_hash}%016x"
        if (outcome == Status.Rejected) {
          // oversize guard fires on declared length — no body stored
          FetchResult(imageId, a.url_hash, a.url_canon, a.host, a.host_bucket,
            epoch, a.slot, Array.emptyByteArray, 0, 0, "oversize",
            "", 0L, Status.Rejected, 0.0)
        } else if (outcome == Status.Failed && !Outcomes.isCorrupt(a.url_hash)) {
          // transient network failure: no payload, retry next epoch
          FetchResult(imageId, a.url_hash, a.url_canon, a.host, a.host_bucket,
            epoch, a.slot, Array.emptyByteArray, 0, 0, "none",
            "", 0L, Status.Failed, 0.0)
        } else {
          // fetched: DOWNLOADED → validate → PROCESSED | FAILED
          val w = Outcomes.width(a.url_hash)
          val h = Outcomes.height(a.url_hash)
          val fmt = Outcomes.fmt(a.url_hash)
          val src = ImageCodec.pixels(a.url_hash, w, h)
          val wire0 = ImageCodec.encode(src, w, h, fmt)
          // corrupt-payload fixture: flip a body byte after encoding
          val wire = if (Outcomes.isCorrupt(a.url_hash)) {
            val c = wire0.clone(); c(6) = (c(6) ^ 0x55).toByte; c
          } else wire0
          val caption = Outcomes.caption(a.docid, a.host)
          val (status, psnr) = ImageCodec.decode(wire) match {
            case Some((dw, dh, dfmt, px)) if dw == w && dh == h && dfmt == fmt =>
              val p = ImageCodec.psnr(src, px)
              val ok =
                if (fmt == "png") p.isPosInfinity // lossless: bit-exact
                else p >= PsnrFloorDb // lossy: 40dB floor
              (if (ok) Status.Processed else Status.Failed, p)
            case _ => (Status.Failed, 0.0)
          }
          val ph = ImageCodec.phash(src, w, h)
          FetchResult(imageId, a.url_hash, a.url_canon, a.host, a.host_bucket,
            epoch, a.slot, wire, w, h, fmt, caption, ph, status,
            if (psnr.isPosInfinity) 99.0 else math.floor(psnr * 100) / 100)
        }
      }
    }
  }
}
