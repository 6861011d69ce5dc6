package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GridFS file-content enrichment (S7, `addFileContent`
  * monstache.go:1405-1433): ops in file-namespaces get the file's bytes
  * base64-encoded onto the doc as `file`; files over `max-file-size`
  * (default cap config, monstache.go:98, 2870-2872) are NOT attached —
  * the doc still indexes without content. The reference runs a 10-way
  * download pool; here attachment is a per-row column expression, and at
  * scale real blob fetches become `spark.read.format("binaryFile")` +
  * this same base64/cap projection. */
object FileContent {

  def attach(df: DataFrame, contentCol: String, maxBytes: Int): DataFrame =
    df.withColumn("file",
      when(octet_length(col(contentCol)) <= maxBytes,
        graft.codec.Codecs.binaryToBase64(col(contentCol).cast("binary"))))
}
