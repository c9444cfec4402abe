package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.DotProductF

/** ANN index registry: declaring an IVF index for a path opts KNN
  * queries over that path into index-accelerated (approximate) answers.
  *
  * This is the contract every vector store ships: the user REGISTERS an
  * index over a corpus, and from then on `ORDER BY cosine DESC LIMIT k`
  * against it is answered through the index — approximate by
  * declaration, with `nprobe` the declared recall/cost dial. The
  * registry holds only index METADATA (the nlist seed centroids and the
  * probe width, a few KB); the rewrite never fires for unregistered
  * paths, so ordinary sorts are untouched.
  */
object KnnIndexRegistry {
  final case class Entry(seeds: Array[Array[Float]], nprobe: Int)

  private val entries = TrieMap.empty[String, Entry]

  private def canon(p: String): String =
    new java.io.File(p).getAbsolutePath.stripSuffix("/")

  def register(indexPath: String, seeds: Array[Array[Float]],
      nprobe: Int): Unit =
    entries(canon(indexPath)) = Entry(seeds, nprobe)

  def unregister(indexPath: String): Unit = entries.remove(canon(indexPath))

  def clear(): Unit = entries.clear()

  private[plans] def lookup(
      rootPaths: Seq[org.apache.hadoop.fs.Path]): Option[Entry] =
    rootPaths match {
      case Seq(p) => entries.get(p.toUri.getPath.stripSuffix("/"))
      case _ => None
    }
}

/** SURVEY §4 optional-Catalyst item 3: a `Rule[LogicalPlan]` that
  * rewrites a brute-force KNN plan —
  *
  *   GlobalLimit(k, LocalLimit(k, Sort(cosine(q, embedding) DESC, scan)))
  *
  * — onto a registered IVF index by injecting the coarse-quantizer
  * partition filter `cell IN (topCells(q))` above the index scan. The
  * user writes the DECLARATIVE query (order by cosine distance, limit
  * k) with no mention of cells; the rule recognizes the top-k-by-cosine
  * shape, extracts the (constant-folded) query vector literal from the
  * sort key's `dot_f(queryLit, embedding)` term, ranks the registry's
  * centroids against it ON THE DRIVER at optimization time (nlist dot
  * products — pure metadata math, the same `topCells` arithmetic the
  * explicit `annIvf` path uses), and narrows the scan to the `nprobe`
  * best cells. FileSourceStrategy then turns the injected predicate
  * into PartitionFilters: candidate IO drops to ~nprobe/nlist of the
  * corpus, which is the entire point of IVF at 100 TB.
  *
  * Safety rails: fires only under a Limit (pruning an UNLIMITED sort
  * would change its full result set, top-k is the approximable shape),
  * only for single-root scans registered in [[KnnIndexRegistry]] (the
  * registration IS the user's opt-in to approximate answers), only when
  * the first sort key is a Descending expression whose `dot_f` pairs a
  * foldable float-array literal with the scanned relation's own
  * embedding column, and never twice (rewritten relations are tagged —
  * the rule lives in a fixed-point batch).
  */
object KnnIvfRewrite extends Rule[LogicalPlan] {

  private val RewrittenTag = TreeNodeTag[Boolean]("graft.knn.ivfRewritten")

  /** Top-k only: a huge k defeats the index (and the driver-side merge
    * a TakeOrderedAndProject does); beyond this the rule stands down
    * and the exact sort runs. */
  val MaxK = 10000

  /** Install into the session's experimental optimizer rules
    * (idempotent) — same mechanism as [[AsOf.register]]; sessions built
    * with `spark.sql.extensions=graft.GraftExtensions` get it from the
    * extension point instead. */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(KnnIvfRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ KnnIvfRewrite

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case ll @ LocalLimit(IntegerLiteral(k), body) if k <= MaxK =>
      val nb = rewriteBelowLimit(body)
      if (nb.eq(body)) ll else ll.copy(child = nb)
  }

  /** The top-k Sort sits under the LocalLimit with only Projects in
    * between (the optimizer interposes one when a window or projection
    * above re-computes the sort key). Anything else — a join, another
    * limit — ends the walk: a Sort deeper in the tree is not bounded by
    * THIS limit and pruning it would change an exact result. */
  private def rewriteBelowLimit(p: LogicalPlan): LogicalPlan = p match {
    case proj: Project =>
      val nc = rewriteBelowLimit(proj.child)
      if (nc.eq(proj.child)) proj else proj.copy(child = nc)
    case srt @ Sort(order, true, child, _) =>
      rewrite(order, child) match {
        case Some(c2) => srt.copy(child = c2)
        case None => srt
      }
    case other => other
  }

  /** Extract the query vector from the first sort key: Descending, and
    * somewhere in the expression a `dot_f` pairing a foldable
    * float-array with an attribute — the cosine numerator. (The norm
    * terms fold away or pair the attribute with itself, so they can't
    * match.) */
  private def queryVector(order: Seq[SortOrder],
      embedding: AttributeSet): Option[Array[Float]] =
    order.headOption.filter(_.direction == Descending).flatMap { so =>
      so.child.collectFirst {
        case DotProductF(l, r: AttributeReference)
            if isFloatArrayLit(l) && embedding.contains(r) =>
          toFloats(l)
        case DotProductF(l: AttributeReference, r)
            if isFloatArrayLit(r) && embedding.contains(l) =>
          toFloats(r)
      }
    }

  private def isFloatArrayLit(e: Expression): Boolean =
    e.foldable && (e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  private def toFloats(e: Expression): Array[Float] =
    e.eval(null).asInstanceOf[ArrayData].toFloatArray

  /** The ranked relation, reached ONLY through row-preserving nodes
    * (Project/Filter): dropping candidate rows of the relation being
    * ranked is what the approximate contract licenses — pruning a scan
    * buried under a join or aggregate would instead distort
    * intermediate values feeding the sort, which top-k does not
    * legitimize. */
  private def findRelation(p: LogicalPlan): Option[LogicalRelation] =
    p match {
      case proj: Project => findRelation(proj.child)
      case f: Filter => findRelation(f.child)
      case rel: LogicalRelation => Some(rel)
      case _ => None
    }

  private def rewrite(order: Seq[SortOrder],
      child: LogicalPlan): Option[LogicalPlan] = {
    // the index relation: single-root file scan of a registered path,
    // exposing the quantizer's `cell` partition column, not yet rewritten
    val target = findRelation(child).collect {
      case rel @ LogicalRelation(fs: HadoopFsRelation, out, _, _, _)
          if rel.getTagValue(RewrittenTag).isEmpty &&
            out.exists(_.name == "cell") &&
            KnnIndexRegistry.lookup(fs.location.rootPaths).isDefined =>
        (rel, KnnIndexRegistry.lookup(fs.location.rootPaths).get)
    }
    target.flatMap { case (rel, entry) =>
      val embedding =
        AttributeSet(rel.output.filter(_.name == "embedding"))
      queryVector(order, embedding).map { qv =>
        val cells = graft.operators.Similarity
          .topCells(qv, entry.seeds, entry.nprobe)
        val cellAttr = rel.output.find(_.name == "cell").get
        // literal type tracks the partition column's inferred type (a
        // type-mismatched In would be an invalid post-analysis plan)
        val lits = cells.toIndexedSeq.map { c =>
          cellAttr.dataType match {
            case org.apache.spark.sql.types.LongType => Literal(c.toLong)
            case _ => Literal(c)
          }
        }
        val tagged = rel.copy()
        tagged.setTagValue(RewrittenTag, true)
        val pruned = Filter(In(cellAttr, lits), tagged)
        child.transform { case r: LogicalRelation if r.eq(rel) => pruned }
      }
    }
  }
}
