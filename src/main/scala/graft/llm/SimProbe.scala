package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Disposable round-16 measurement shim — exposes cleanVec's algebra to
  * the ScratchProbe without widening Similarity's API. Removed with the
  * probe when attribution is done. */
object SimProbe {
  def clean(c: Column): Column = {
    val broken = exists(c, x => {
      val xd = x.cast("double")
      xd.isNull || !(abs(xd) <= lit(Double.MaxValue))
    })
    when(!broken, transform(c, x => x.cast("double")))
  }
}
