package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relationship fan-out (SURVEY §2.4 J1-J3) — the reference's `[[relate]]`
  * feature (monstache.go:1221-1358): a change in `namespace` triggers a
  * lookup of all documents in `withNamespace` where `matchField` equals the
  * changed doc's `srcField`; each match is re-emitted as a synthetic op that
  * re-enters the pipeline, recursively up to `maxDepth`.
  *
  * Reference execution is a per-op point query against MongoDB from a
  * 10-thread pool with a 1000-op queue that *drops work on overflow*
  * (monstache.go:3397-3401). The Spark re-expression is a set-oriented
  * equi-join per relation, iterated breadth-first to the depth bound — no
  * queue, no shedding, and the join is broadcast when the related side is a
  * dimension table.
  *
  * Scale: each hop is one join keyed on the match field. Small dimensions
  * (customer/nation/region-shaped) broadcast; large-large hops shuffle on
  * the key and benefit from AQE skew handling. Depth is bounded and small
  * (the reference defaults max-depth 0/unbounded but chains are short), so
  * the driver-side loop does not blow up the plan.
  */
case class Relation(
    namespace: String,
    withNamespace: String,
    srcField: String, // a column, or "document.a.b" — a dotted path into the JSON doc
    matchField: String,
    keepSrc: Boolean = false,
    maxDepth: Int = 0, // 0 = unbounded, like the reference (cycle-guarded)
    // `match-field-type` coercion (monstache.go:1157-1219): cast the
    // extracted src value to the related key's type before the join
    // (objectId/string → "string", int/long → "long", decimal → "decimal").
    matchFieldType: Option[String] = None,
    // Broadcast is an explicit opt-in for true dimension tables only. At
    // 100 TB the related side of most relations is NOT broadcastable
    // (driver OOM); default lets AQE pick broadcast at runtime when the
    // built side turns out small.
    broadcastRelated: Boolean = false)

object Relate {

  /** The join key on the changed side (alias `c`): a plain column, or
    * `extractData`'s dotted path into the document (monstache.go:
    * 1112-1138 — the reference always reads src-field out of op.Data),
    * coerced to the configured match-field type (1157-1219). Alias-based
    * resolution keeps recursive hops (self-join lineage in relation
    * cycles) unambiguous.
    *
    * `objectId` coercion (monstache.go:1167-1171): the reference
    * stringifies the value and hex-decodes it into a 12-byte ObjectID —
    * case-insensitive by construction, erroring (op skipped) on
    * non-24-hex input. The string-world port: lowercase valid 24-hex,
    * null otherwise (a null key joins nothing = the same skip). */
  private def srcKey(rel: Relation) = {
    val raw =
      if (rel.srcField.startsWith("document."))
        get_json_object(col("c.document"),
          "$." + rel.srcField.stripPrefix("document."))
      else col("c." + rel.srcField)
    rel.matchFieldType.map {
      case t if t.equalsIgnoreCase("objectId") =>
        when(raw.rlike("^[0-9A-Fa-f]{24}$"), lower(raw))
      // bare "decimal" is decimal(10,0) — any key over 10 digits would
      // overflow to NULL and silently never join; widen to Decimal128's
      // 34-significant-digit shape (the reference coerces to
      // primitive.Decimal128, monstache.go:1208-1219)
      case t if t.equalsIgnoreCase("decimal") => raw.cast("decimal(38,6)")
      case t => raw.cast(t)
    }.getOrElse(raw)
  }

  /** One hop: changed docs of `rel.namespace` joined to the related
    * collection. Emits the related docs as synthetic direct-query ops
    * (source=direct_query, fresh version, monstache.go:1289-1298).
    * `carry` names CHANGE-side columns propagated onto each emitted row
    * verbatim — what synthetic-op stamping needs (the reference stamps
    * emitted ops from the triggering op's context); across recursive
    * hops the ORIGINAL seed's values ride through, since each emitted
    * frame re-enters as the next hop's change side. Carried names must
    * not collide with related columns. */
  def hop(changes: DataFrame, related: DataFrame, rel: Relation,
          carry: Seq[String] = Nil): DataFrame = {
    val r = if (rel.broadcastRelated) broadcast(related) else related
    changes.alias("c")
      .join(r.alias("r"), srcKey(rel) === col("r." + rel.matchField))
      .select(col("r.*") +: carry.map(n => col("c." + n).as(n)): _*)
  }

  /** One hop keeping both sides — used when the emitted doc must carry its
    * provenance (e.g. delete propagation bookkeeping, keep-src=true). */
  def hopPairs(changes: DataFrame, related: DataFrame, rel: Relation): DataFrame = {
    val r = if (rel.broadcastRelated) broadcast(related) else related
    changes.alias("c")
      .join(r.alias("r"), srcKey(rel) === col("r." + rel.matchField))
  }

  /** Breadth-first fan-out across a relation graph keyed by namespace.
    * `collections`: namespace → its full collection DataFrame (the Spark
    * stand-in for the reference's Mongo lookups). Returns the union of all
    * emitted related docs, tagged with the namespace they belong to
    * (`rel_namespace`) and the depth at which they were produced
    * (`rel_depth`; 0 = an indexed source doc).
    *
    * Depth semantics follow the reference (monstache.go:1331-1335): each
    * relation's `maxDepth` bounds how deep *that* relation may fire;
    * 0 means unbounded. An edge fires on every wave that reaches its
    * source namespace — in a DAG where a namespace re-enters the frontier
    * via a longer path, the later wave propagates onward too (the
    * reference re-queues every synthetic op, monstache.go:1327-1341).
    * Termination for *cyclic* unbounded graphs is `safetyCap` waves: the
    * reference has no cycle guard at all and relies on relate-queue
    * overflow dropping work (monstache.go:3397-3401); a deterministic
    * depth cap replaces that load-shedding.
    *
    * Emission follows routeDataRelate (monstache.go:3419-3462), applied at
    * every depth: docs of a namespace are indexed iff the namespace has no
    * onward relations, or some onward relation has `keepSrc = true`;
    * otherwise the namespace is join-only and its docs only propagate. */
  def fanOut(spark: SparkSession,
             seeds: Map[String, DataFrame],
             collections: Map[String, DataFrame],
             relations: Seq[Relation],
             safetyCap: Int = 32,
             carry: Seq[String] = Nil): DataFrame = {
    var out: Option[DataFrame] = None
    def emit(df: DataFrame): Unit =
      out = out.map(_.unionByName(df, allowMissingColumns = true)).orElse(Some(df))
    def indexed(ns: String): Boolean = {
      val onward = relations.filter(_.namespace == ns)
      onward.isEmpty || onward.exists(_.keepSrc)
    }
    def tag(ns: String, df: DataFrame, depth: Int): DataFrame =
      df.withColumn("rel_namespace", lit(ns)).withColumn("rel_depth", lit(depth))

    for ((ns, df) <- seeds if indexed(ns)) emit(tag(ns, df, 0))

    var frontier: Map[String, DataFrame] = seeds
    var depth = 0
    while (frontier.nonEmpty && depth < safetyCap) {
      depth += 1
      val produced = scala.collection.mutable.Map[String, DataFrame]()
      for {
        (ns, changed) <- frontier
        rel <- relations.filter(_.namespace == ns)
        coll <- collections.get(rel.withNamespace)
        if rel.maxDepth == 0 || depth <= rel.maxDepth
      } {
        val emitted = hop(changed, coll, rel, carry)
        produced(rel.withNamespace) = produced.get(rel.withNamespace)
          .map(_.unionByName(emitted)).getOrElse(emitted)
      }
      for ((ns, df) <- produced if indexed(ns)) emit(tag(ns, df, depth))
      frontier = produced.toMap
    }
    out.getOrElse(spark.emptyDataFrame)
  }

  /** J2 identity-relation delete propagation: delete keys in the parent
    * namespace select the related docs to delete (monstache.go:1239-1251).
    * A semi-join keeps it set-oriented. The SELECTION only: rows come
    * back verbatim, and the caller stamps the delete op and its version
    * (see [[DeleteStrategies.recoverAndPropagate]] for the variant that
    * applies the reference's +2 delete offset itself).
    *
    * No forced broadcast: a mass delete (the reference's dropDatabase-
    * scale cascade) makes the key side arbitrarily large, so the join
    * strategy is left to AQE — it broadcasts small delete sets at runtime
    * and falls back to a shuffled semi-join when they are not. */
  def propagateDeletes(deletedKeys: DataFrame, related: DataFrame,
                       srcField: String, matchField: String): DataFrame =
    related.join(deletedKeys, col(matchField) === col(srcField), "left_semi")
}
