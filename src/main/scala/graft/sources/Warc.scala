package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) ingestion — the wire format web-crawl corpora
  * (CommonCrawl and friends) actually arrive in, and therefore the real
  * FIRST step of a crawl-curation pipeline (the q251 capstone's input).
  *
  * Processing model: ONE task per WARC file. WARC is not byte-splittable
  * (records are length-prefixed by headers, and the standard `.warc.gz`
  * layout gzips each record as its own member — resynchronizing from an
  * arbitrary offset requires an external index), so the unit of
  * parallelism is the FILE, exactly how production crawl jobs shard:
  * CommonCrawl publishes ~64k files per snapshot, far more than any
  * cluster's core count, so file-granular parallelism saturates 1000
  * executors without reading a byte twice. `binaryFiles` gives one
  * partition per file here.
  *
  * Reference: minispark has no crawl-format support at all — this is a
  * beyond-reference source in the q251/q263 web-crawl family.
  */
object Warc {

  /** One row per WARC record. `http_status` is parsed from the embedded
    * HTTP response (-1 for non-response records), `body` is the HTTP
    * payload for responses and the raw block otherwise. */
  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("body", StringType, nullable = false)))

  /** Read a directory (or glob) of `.warc` / `.warc.gz` files — one
    * scan task per file (see the scaladoc processing model), parsed as
    * a STREAM: memory per task is one record, never the file (a
    * CommonCrawl shard is ~1 GB — materializing it per task would cap
    * task concurrency at heap/1 GB). Gzip inputs may be single-stream
    * or the standard member-per-record concatenation (GZIPInputStream
    * drains concatenated members transparently). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = pds.open()
        val in: java.io.InputStream =
          if (file.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(raw, 65536)
          else new java.io.BufferedInputStream(raw, 65536)
        parseStream(in).map { r =>
          Row(file, r.warcType, r.targetUri.orNull, r.warcDate.orNull,
            r.httpStatus, r.contentType.orNull, r.body)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private final case class Rec(warcType: String, targetUri: Option[String],
                               warcDate: Option[String], httpStatus: Int,
                               contentType: Option[String], body: String)

  /** Streaming record walk: `WARC/<ver>` header block (CRLF-separated
    * `Name: value` lines, blank-line-terminated), then exactly
    * `Content-Length` bytes of block, then the record-separator CRLFs.
    * Malformed or truncated tails END the walk and close the stream
    * (loud length errors would reject whole files for one cut-off
    * trailing record — a crawl reader must salvage the prefix; the
    * divergence from the everything-or-error rule is deliberate and
    * documented here). The stream closes when the iterator exhausts. */
  private def parseStream(in: java.io.InputStream): Iterator[Rec] =
    new Iterator[Rec] {
      private var nextRec: Option[Rec] = advance()
      override def hasNext: Boolean = nextRec.nonEmpty
      override def next(): Rec = {
        val r = nextRec.get
        nextRec = advance()
        r
      }
      /** one CRLF-terminated line, CRLF stripped; None at EOF with
        * nothing read */
      private def readLine(): Option[String] = {
        val buf = new java.io.ByteArrayOutputStream(128)
        var prev = -1
        var c = in.read()
        if (c < 0) return None
        while (c >= 0) {
          if (prev == '\r' && c == '\n') {
            val arr = buf.toByteArray
            return Some(new String(arr, 0, arr.length - 1, "UTF-8"))
          }
          buf.write(c); prev = c; c = in.read()
        }
        Some(buf.toString("UTF-8")) // EOF without a final CRLF
      }
      private def stop(): Option[Rec] = { in.close(); None }
      private def advance(): Option[Rec] = {
        // skip inter-record blank lines to the next magic line
        var magic = readLine()
        while (magic.exists(_.isEmpty)) magic = readLine()
        val m = magic.getOrElse(return stop())
        if (!m.startsWith("WARC/")) return stop()
        var warcType = ""; var uri: Option[String] = None
        var date: Option[String] = None; var clen = -1L
        var recContentType: Option[String] = None
        var headerDone = false
        while (!headerDone) {
          readLine() match {
            case None => return stop() // EOF inside a header: truncated
            case Some("") => headerDone = true
            case Some(line) =>
              val c = line.indexOf(':')
              if (c > 0) {
                val k = line.take(c).trim.toLowerCase(java.util.Locale.ROOT)
                val v = line.drop(c + 1).trim
                k match {
                  case "warc-type" => warcType = v
                  case "warc-target-uri" => uri = Some(v)
                  case "warc-date" => date = Some(v)
                  case "content-length" =>
                    clen = try v.toLong
                      catch { case _: NumberFormatException => -1L }
                  case "content-type" => recContentType = Some(v)
                  case _ => ()
                }
              }
          }
        }
        if (clen < 0) return stop()
        if (clen > Int.MaxValue - 8) {
          // a record too large to hold as one string: DRAIN it (keeping
          // the walk aligned) and continue — ending here would silently
          // drop every valid record after one oversized one
          var left = clen
          while (left > 0) {
            val s = in.skip(left)
            if (s > 0) left -= s
            else if (in.read() < 0) return stop() // true EOF
            else left -= 1
          }
          return advance()
        }
        val blockBytes = in.readNBytes(clen.toInt)
        if (blockBytes.length < clen) return stop() // truncated block
        val block = new String(blockBytes, "UTF-8")
        // response records embed an HTTP message: status line, headers,
        // blank line, body — surface the status, payload content type
        // and the body alone
        if (warcType == "response" && block.startsWith("HTTP/")) {
          val statusLine = block.takeWhile(_ != '\r')
          val status = statusLine.split(" ").lift(1)
            .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(-1)
          val headerEnd = block.indexOf("\r\n\r\n")
          val (hdrs, body) =
            if (headerEnd < 0) (block, "")
            else (block.take(headerEnd), block.drop(headerEnd + 4))
          val ct = hdrs.split("\r\n").find(
              _.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:"))
            .map(_.split(":", 2)(1).trim)
          Some(Rec(warcType, uri, date, status, ct, body))
        } else Some(Rec(warcType, uri, date, -1, recContentType, block))
      }
    }

  /** Serialize (uri, date, body) rows into ONE WARC file's bytes —
    * response records wrapping an HTTP 200 text/plain message; the
    * fixture generator for [[read]] (and a valid exporter for handing
    * curated pages back to WARC-consuming tools). `gzip = true` writes
    * the standard member-per-record gzip layout. */
  def warcBytes(records: Seq[(String, String, String)],
                gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((uri, date, body), i) =>
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
      val httpBytes = http.getBytes("UTF-8")
      val rec = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:rec-$i>\r\n" +
        s"WARC-Date: $date\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${httpBytes.length}\r\n\r\n").getBytes("UTF-8") ++
        httpBytes ++ "\r\n\r\n".getBytes("UTF-8")
      if (gzip) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec); gz.finish() // one member per record
      } else out.write(rec)
    }
    out.toByteArray
  }
}
