package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** The persisted audit-artifact layout (sample + ground-truth pairs):
  * write once, sweep many — a tier audited from disk must equal the
  * direct in-memory audit row for row, and the selector consumes
  * either. */
class AuditArtifactsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def d(x: Double): java.lang.Double = Double.box(x)

  // 16-dim fixture with planted near-dups (the SignLshSpec family)
  private def corpus = {
    import spark.implicits._
    val base = (0L until 24L).map { i =>
      i -> Seq.tabulate(16)(j =>
        d(math.cos((i * 16 + j) % 7 + 1) + (if (j == (i % 16)) 2.0 else 0.0)))
    }
    val dups = base.take(6).map { case (i, v) =>
      (i + 100L) -> v.zipWithIndex.map { case (x, j) =>
        if (j < 2) d(x + 0.01) else x }
    }
    (base ++ dups).toDF("vec_id", "v")
  }

  test("audit-from-artifacts ≡ direct audit; selector consumes either") {
    val dir = Files.createTempDirectory("graft-audit-art").toString
    val df = corpus
    Similarity.writeAuditArtifacts(df, dir, minCos = 0.9, dim = 16,
      idCol = "vec_id", vecCol = "v")
    val bits = Similarity.signBitsArtifact(df, dim = 16, idCol = "vec_id",
      vecCol = "v", planes = 16)
    val tiers = Seq(
      "a_b2" -> Similarity.pairsFromBits(bits, minCos = 0.9,
        planes = 16, bands = 2),
      "b_b2p4" -> Similarity.pairsFromBits(bits, minCos = 0.9,
        planes = 16, bands = 2, probes = 4))
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(_.toSeq).toSet
    val direct = Similarity.lshRecallReportTiers(df, tiers, minCos = 0.9,
      dim = 16, idCol = "vec_id", vecCol = "v")
    val fromDisk = Similarity.auditFromArtifacts(spark, dir, tiers)
    assert(rows(fromDisk) === rows(direct))
    assert(fromDisk.head().getAs[Long]("n_true") > 0,
      "fixture has no true pairs — fix the fixture, not the assert")
    val pick = Similarity.selectLshConfig(fromDisk,
      targetRecallMicro = 900000L).collect()
    assert(pick.length === 1)
    val direct1 = Similarity.selectLshConfig(direct,
      targetRecallMicro = 900000L).collect()
    assert(pick.map(_.toSeq).toSeq === direct1.map(_.toSeq).toSeq)
  }
}
