package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.json4s._
import org.json4s.jackson.JsonMethods

/** GridFS file-content enrichment (S7, `addFileContent`
  * monstache.go:1405-1433): ops in file-namespaces get the file's bytes
  * base64-encoded onto the doc as `file`; files over `max-file-size`
  * (default cap config, monstache.go:98, 2870-2872) are NOT attached —
  * the doc still indexes without content. The reference runs a 10-way
  * download pool; here attachment is a per-row column expression, and at
  * scale real blob fetches become `spark.read.format("binaryFile")` +
  * this same base64/cap projection. */
object FileContent {

  /** Attach base64 file content as `file`. `maxBytes <= 0` means no cap
    * (the reference's default: MaxFileSize 0 skips the size check,
    * monstache.go:1425-1429); a non-empty `namespaces` list restricts
    * attachment to ops from those file-namespaces (`file-namespaces`,
    * monstache.go:394) — other rows keep a null `file` and index
    * without content, exactly the over-cap behavior. */
  def attach(df: DataFrame, contentCol: String, maxBytes: Long = 0L,
             namespaces: Seq[String] = Nil): DataFrame = {
    val underCap =
      if (maxBytes <= 0) lit(true)
      else octet_length(col(contentCol)) <= maxBytes
    val inNs =
      if (namespaces.isEmpty) lit(true)
      else col("namespace").isin(namespaces: _*)
    df.withColumn("file",
      when(inNs && underCap,
        graft.codec.Codecs.binaryToBase64(col(contentCol).cast("binary"))))
  }

  /** Tag file-namespace rows whose content exceeds the cap with the
    * advisory [[Quarantine.OversizedFile]] reason — the reference LOGS
    * the oversize skip (monstache.go:1425-1429) while still indexing the
    * doc without content; [[attach]] alone leaves skipped rows
    * indistinguishable from out-of-namespace ones. The op is NOT removed
    * (advisory, not fatal); [[graft.sink.SinkWriter.writeBatch]] copies
    * the tag to the quarantine channel. A pre-existing reason column is
    * kept (first reason wins — one op, one headline reason). */
  def tagSkips(df: DataFrame, contentCol: String, maxBytes: Long,
               namespaces: Seq[String] = Nil): DataFrame = {
    if (maxBytes <= 0) df
    else {
      val inNs =
        if (namespaces.isEmpty) lit(true)
        else col("namespace").isin(namespaces: _*)
      val over = inNs && octet_length(col(contentCol)) > maxBytes
      val prior =
        if (df.columns.contains(Quarantine.ReasonCol))
          Seq(col(Quarantine.ReasonCol))
        else Seq.empty
      df.withColumn(Quarantine.ReasonCol,
        coalesce(prior :+ when(over, lit(Quarantine.OversizedFile)): _*))
    }
  }

  /** Fold an attached `file` column INTO the document body — the
    * reference sets `op.Data["file"] = base64` (addFileContent,
    * monstache.go:1416-1432), so content travels inside the indexed doc,
    * not beside it, and survives a sink boundary that ships only the
    * document. The rewrite is the same canonical sorted-key scalar form
    * as [[Routing.extractDocMeta]]'s meta strip; only rows that actually
    * carry content (non-null `file` AND a document to fold into) leave
    * column algebra — over-cap, out-of-namespace and delete rows pass
    * through codegen untouched. A frame without a `file` column (e.g.
    * `index-files = false` upstream) is returned as-is. */
  private val foldUdf = udf { (doc: String, file: String) =>
    // lenient parse (NaN/Infinity literals admitted — the same tolerance
    // as prune-invalid-json, which in the reference's order runs AFTER
    // file attach); a document beyond even that indexes WITHOUT content
    // rather than killing the stream — the reference's content-error
    // path logs and forwards the op (startDownload, monstache.go:
    // 4470-4482)
    val parsed =
      try graft.codec.PruneInvalidJson.parseLenient(doc)
      catch { case scala.util.control.NonFatal(_) => JNothing }
    parsed match {
      case JObject(fields) =>
        JsonMethods.compact(JsonMethods.render(JObject(
          (("file" -> JString(file): JField) ::
            fields.filterNot(_._1 == "file")).sortBy(_._1))))
      // JNothing = unparseable; any other valid JSON (array, scalar)
      // simply cannot carry a `file` field. Both forward the document
      // BYTE-IDENTICAL (re-rendering would canonicalize whitespace and
      // numbers — a silent mutation) and drop the content — the
      // reference's content-error path: log and forward the op
      // (monstache.go:4470-4482)
      case _ => doc
    }
  }

  def foldIntoDocument(df: DataFrame): DataFrame =
    if (!df.columns.contains("file")) df
    else df.withColumn("document",
        when(col("file").isNotNull && col("document").isNotNull,
          foldUdf(col("document"), col("file")))
          .otherwise(col("document")))
      .drop("file")
}
