package graft.canonical

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.schema.Mention

/** Entity canonicalization.
  *
  * Two layers:
  *
  *  1. [[CorefMerge]] — the reference's in-document coreference merge,
  *     exact semantics (`/root/reference/iepy/preprocess/stanford_preprocess.py:365-445`),
  *     a per-document local fold (no shuffle; runs inside `mapGroups`).
  *
  *  2. [[Canonicalize.components]] — the cross-document canonicalization of
  *     the north star: connected components over alias/surface-form
  *     similarity edges, as iterative DataFrame joins propagating
  *     `min(component)` to fixpoint. The per-iteration aggregations are
  *     algebraic (`min`), so Spark's partial aggregation (map-side combine)
  *     absorbs alias-frequency skew before the shuffle; each iteration is
  *     checkpointed to keep lineage flat at 10^12-file scale.
  */
object Canonicalize {

  /** Normalized surface forms of an alias; two entities sharing any form
    * are merged (same kind only). Forms: exact, lowercase, and a
    * case/underscore fold that unifies snake_case / camelCase / kebab-case
    * identifiers — the code-corpus analog of IEPy's surface-form identity
    * (`stanford_preprocess.py:285-304`).
    *
    * HARD CONTRACT for [[components]]' fixed iteration count: every form
    * here must be a refinement chain ENDING in the most-folded form —
    * i.e. two aliases sharing ANY form also share the folded form (exact
    * equality => lower equality => folded equality). That makes every
    * component a star through its folded-form hub (diameter <= 2 entity
    * hops), which 2 min-propagation rounds provably converge. Adding a
    * normalizer that can CHAIN (edit-distance buckets, token-prefix
    * families, embedding buckets) breaks the star shape: raise
    * `iterations` AND run with `verifyConverged = true` in tests, or
    * components silently under-merge. */
  def normalForms(alias: String): Seq[String] = {
    val lower = alias.toLowerCase
    val folded = lower.replaceAll("[-_\\s]+", "")
    Seq(alias, lower, folded).distinct
  }

  /** [[normalForms]] as a pure Catalyst expression over an `alias`
    * column (codegen-friendly, no UDF) — the ONE definition both
    * [[components]]' edge derivation and the streaming incremental
    * linker's touch detection use; if they ever diverged, the
    * incremental path would silently under-merge. */
  private[graft] def formsExpr: org.apache.spark.sql.Column =
    array_distinct(array(
      col("alias"), lower(col("alias")),
      regexp_replace(lower(col("alias")), "[-_\\s]+", "")))

  /** (entity_key, form) rows for an entity table — form keys include the
    * kind (never merge across kinds), exactly as [[components]] builds
    * its edges. Entity-vocab bounded. */
  def entityForms(entities: DataFrame): DataFrame =
    entities
      .select(col("entity_key"), col("kind"), explode(formsExpr).as("f"))
      .select(col("entity_key"),
        concat_ws(" ", col("kind"), col("f")).as("form"))

  /** Connected components over a bipartite (vertex, form) edge list.
    *
    * Input: DataFrame [entity_key: String, kind: String, alias: String].
    * Output: DataFrame [entity_key, canonical] where canonical is the
    * component representative's entity_key.
    *
    * min-propagation over the bipartite graph converges in O(diameter)
    * rounds; diameter of alias-similarity graphs is tiny (forms chain
    * through at most a few normalizers). Every round is two shuffles
    * (groupBy form, groupBy entity), both algebraic-min aggregations.
    */
  def components(spark: SparkSession, entities: DataFrame,
      iterations: Int = 2, verifyConverged: Boolean = false): DataFrame = {
    import spark.implicits._
    // (entity, form) edges; kind is part of the form key: never merge
    // across kinds (reference `stanford_preprocess.py:366-374`).
    // normalForms as pure Catalyst exprs (codegen-friendly, no UDF) —
    // the shared [[formsExpr]], so the incremental linker's touch
    // detection sees exactly these edges. No distinct(): duplicate edges
    // are harmless under min-aggregation and removing them would cost a
    // full extra shuffle.
    val formsCol = formsExpr

    // The component id IS the canonical pick: propagate the minimum of
    // struct(gaz_rank, entity_key), so gazette-born readable keys win the
    // representative election and no separate ranking join is needed.
    val gazRank =
      if (entities.columns.contains("from_gazette"))
        when(col("from_gazette"), 0).otherwise(1)
      else lit(0)

    // edges carry their vertex's INITIAL component inline, so round 1's
    // form-side aggregation needs no join at all (one join + one
    // broadcast fewer in the chain — the chain's cost is stage overhead,
    // not data, so every removed stage is a direct win)
    val edges = graft.pipeline.Caches.tracked(entities
      .select($"entity_key", $"kind",
        struct(gazRank.as("r"), $"entity_key".as("k")).as("init"),
        explode(formsCol).as("f"))
      .select($"entity_key", $"init",
        concat_ws(" ", $"kind", $"f").as("form")))
      // narrow (no shuffle); reused 2x per iteration; tracked so the
      // pipeline run handle / bench harness releases it post-materialize

    // FIXED iteration count, fully lazy: no per-iteration action, so the
    // whole CC is one job when the caller finally acts. Convergence needs
    // rounds >= component diameter in entity-hops; alias-similarity
    // components are stars around the shared surface form (diameter <= 2),
    // so 2 rounds converge. A per-round driver-side convergence check
    // would serialize the pipeline on many small jobs — measured 2x the
    // whole pipeline's wall time at SF=0.1 — and is only worth it for
    // adversarial graphs (then: doubling checks every K rounds +
    // localCheckpoint to cut lineage).
    var comp = entities.select($"entity_key",
      struct(gazRank.as("r"), $"entity_key".as("k")).as("component"))
    var it = 0
    // byForm / comp are component maps keyed by form / entity key —
    // distinct-entity-sized, far below the mention stream. dimSide:
    // AQE broadcasts them when measured small (default); the bench
    // children run AQE-off and force the hint (graft.dim.broadcast).
    def round(c: DataFrame, first: Boolean): DataFrame = {
      val byForm =
        if (first) edges.groupBy($"form").agg(min($"init").as("fcomp"))
        else edges.join(graft.textops.TextOps.dimSide(c), "entity_key")
          .groupBy($"form").agg(min($"component").as("fcomp"))
      edges.join(graft.textops.TextOps.dimSide(byForm), "form")
        .groupBy($"entity_key").agg(min($"fcomp").as("component"))
    }
    while (it < iterations) {
      comp = round(comp, it == 0)
      it += 1
    }
    if (verifyConverged) {
      // one extra round must be a fixpoint — the guard for the star-shape
      // contract at normalForms (costs one action; test/debug only)
      val frozen = comp.persist()
      val changed = round(frozen, first = false)
        .withColumnRenamed("component", "next")
        .join(frozen, "entity_key")
        .where($"next" =!= $"component").count()
      require(changed == 0,
        s"CC not converged after $iterations rounds: $changed components " +
          "still moving — a normalizer violates the star-shape contract " +
          "(see normalForms); raise `iterations`")
      frozen.unpersist()
    }
    comp.select($"entity_key", $"component.k".as("canonical"))
  }
}

/** Reference-faithful in-document coreference merge (P11). */
object CorefMerge {

  final case class CorefError(msg: String) extends Exception(msg)

  /** One coref chain: (i, j, head) token spans, representative first. */
  type Chain = Seq[(Int, Int, Int)]

  /** Entity view needed by the merge: key + kind + gazette linkage. */
  final case class Ent(key: String, kind: String, gazette: Option[String])

  /** Apply one chain to a document's mentions
    * (`stanford_preprocess.py:377-445`). Returns the updated mention list.
    *
    * - no existing occurrence at any head token -> nothing happens
    * - representants pickable only if non-anaphora; none -> nothing
    * - mixed kinds or >=2 distinct gazette items -> CorefError
    * - canonical = first NER-born (non-gazette) pickable entity, else
    *   first pickable
    * - missing chain references created as anaphora=True occurrences
    *   (phrases of >=5 tokens shrink to the head token)
    * - all occurrences of merged entities re-pointed to canonical
    */
  def applyChain(
      docId: String,
      tokens: Array[String],
      mentions: Seq[Mention],
      entityOf: String => Ent,
      chain: Chain): Seq[Mention] = {
    val byToken = mutable.Map.empty[Int, mutable.ArrayBuffer[Mention]]
    mentions.foreach { m =>
      (m.offset until m.offset_end).foreach { i =>
        byToken.getOrElseUpdate(i, mutable.ArrayBuffer.empty) += m
      }
    }
    val entities = mutable.ArrayBuffer.empty[String]
    val pickable = mutable.ArrayBuffer.empty[String]
    val missing = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    chain.sorted.foreach { case (i, j, head) =>
      byToken.get(head) match {
        case Some(ms) if ms.nonEmpty =>
          ms.foreach { m =>
            entities += m.entity_key
            if (!m.anaphora) pickable += m.entity_key
          }
        case _ => missing += ((i, j, head))
      }
    }
    if (pickable.isEmpty) return mentions
    val ents = entities.map(entityOf)
    if (ents.map(_.kind).distinct.size != 1)
      throw CorefError(s"Cannot merge entities of different kinds")
    if (ents.flatMap(_.gazette).distinct.size > 1)
      throw CorefError(s"Cannot merge entities of different gazette items")

    val fromNer = pickable.filter(k => entityOf(k).gazette.isEmpty)
    val canonical = if (fromNer.nonEmpty) fromNer.head else pickable.head
    val canonicalEnt = entityOf(canonical)

    val created = missing.map { case (i0, j0, head) =>
      val (i, j) = if (j0 - i0 >= 5) (head, head + 1) else (i0, j0)
      Mention(docId, i, j, canonicalEnt.kind,
        tokens.slice(i, j).mkString(" "), canonical,
        from_gazette = canonicalEnt.gazette.isDefined, ner_rank = 0,
        anaphora = true)
    }.filterNot(c => mentions.exists(m =>
      m.offset == c.offset && m.offset_end == c.offset_end))

    val merged = entities.toSet - canonical
    val repointed = mentions.map { m =>
      if (merged.contains(m.entity_key)) m.copy(entity_key = canonical)
      else m
    }
    repointed ++ created
  }

  /** Apply a document's chains in order, swallowing per-chain merge
    * refusals the way the reference logs-and-continues on
    * CoreferenceError (`stanford_preprocess.py:131-133`). */
  def applyChains(
      docId: String,
      tokens: Array[String],
      mentions: Seq[Mention],
      entityOf: String => Ent,
      chains: Seq[Chain]): Seq[Mention] =
    chains.foldLeft(mentions) { (ms, ch) =>
      try applyChain(docId, tokens, ms, entityOf, ch)
      catch { case _: CorefError => ms }
    }
}
