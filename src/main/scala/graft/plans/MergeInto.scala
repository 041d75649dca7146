package graft.plans

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.operators.Upsert

/** `MERGE INTO` SQL surface (SURVEY.md §7.3) — the reference's generated
  * stored-proc MERGE (`utilities/helpers/table_generator.py:39-58`) as a
  * first-class SQL statement instead of an operator call.
  *
  * Spark's parser already produces a [[MergeIntoTable]] logical plan; for
  * plain parquet/temp-view relations the built-in analyzer has no row-level
  * execution path, so [[GraftMergeRule]] (registered through
  * `SparkSessionExtensions.injectResolutionRule`) rewrites the supported
  * shape —
  *
  * {{{
  *   MERGE INTO warehouse USING staging ON warehouse.k = staging.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * — into [[GraftMergeCommand]], which runs the engine's [[Upsert]]
  * (source-wins window dedup, one shuffle on the key) and replaces the
  * target in place. Unsupported merge shapes (conditional actions, DELETE,
  * per-column SET lists, NOT MATCHED BY SOURCE) fail analysis loudly rather
  * than silently changing semantics.
  */
object GraftMerge {

  /** Merge keys from the ON condition: a conjunction of same-name equality
    * predicates (`t.k = s.k [AND ...]`). */
  private[plans] def keysOf(cond: Expression): Seq[String] = cond match {
    case And(l, r) => keysOf(l) ++ keysOf(r)
    case EqualTo(a, b) =>
      (attrName(a), attrName(b)) match {
        case (Some(an), Some(bn)) if an.equalsIgnoreCase(bn) => Seq(an)
        case _ => throw notSupported(
          s"ON predicate must equate same-named key columns, got: ${cond.sql}")
      }
    case other => throw notSupported(
      s"ON condition must be a conjunction of key equalities, got: ${other.sql}")
  }

  private def attrName(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case a: Attribute => Some(a.name)
    case _ => None
  }

  private[plans] def tableName(p: LogicalPlan): String = p match {
    case u: UnresolvedRelation => u.multipartIdentifier.mkString(".")
    case SubqueryAlias(id, _) => (id.qualifier :+ id.name).mkString(".")
    case other => throw notSupported(
      s"MERGE target/source must be a named table or view, got: ${other.nodeName}")
  }

  /** True when the action list is the one supported "take source row"
    * shape: UPDATE SET * (possibly already star-expanded to same-name
    * assignments by the analyzer), unconditioned. */
  private[plans] def isUpdateAll(actions: Seq[MergeAction]): Boolean =
    actions match {
      case Seq(UpdateStarAction(None)) => true
      case Seq(UpdateAction(None, assigns, _)) => sameNameAssignments(assigns)
      case _ => false
    }

  private[plans] def isInsertAll(actions: Seq[MergeAction]): Boolean =
    actions match {
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, assigns)) => sameNameAssignments(assigns)
      case _ => false
    }

  private def sameNameAssignments(assigns: Seq[Assignment]): Boolean =
    assigns.forall { a =>
      (attrName(a.key), attrName(a.value)) match {
        case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
        case _ => false
      }
    }

  private def notSupported(msg: String) =
    new UnsupportedOperationException(s"graft MERGE INTO: $msg")

  /** Rewrite a parsed MergeIntoTable into the runnable command (also usable
    * programmatically on sessions built without the extension). */
  def convert(m: MergeIntoTable): LogicalPlan = {
    if (!isUpdateAll(m.matchedActions))
      throw notSupported("WHEN MATCHED must be exactly `THEN UPDATE SET *`")
    if (!isInsertAll(m.notMatchedActions))
      throw notSupported("WHEN NOT MATCHED must be exactly `THEN INSERT *`")
    if (m.notMatchedBySourceActions.nonEmpty)
      throw notSupported("WHEN NOT MATCHED BY SOURCE is not supported")
    GraftMergeCommand(tableName(m.targetTable), tableName(m.sourceTable),
      keysOf(m.mergeCondition))
  }
}

/** Analyzer rule: claim the supported MERGE shape before checkAnalysis can
  * reject it for non-row-level relations. */
class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable => GraftMerge.convert(m)
    case _ => plan
  }
}

/** `spark.sql.extensions` entry point (composes with GraftExtensions). */
class GraftMergeExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectResolutionRule(new GraftMergeRule(_))
}

/** The executable merge: upsert source into target, replace the target.
  *
  * `localCheckpoint` materializes the merged rows on the executors before
  * the target is replaced — it both breaks the self-read (overwriting a
  * table the plan reads from) and the self-reference a re-registered temp
  * view would otherwise carry. At warehouse scale the swap target would be
  * a transactional table format; the SQL surface and plan rewrite carry
  * over unchanged.
  */
case class GraftMergeCommand(targetTable: String, sourceTable: String,
                             keys: Seq[String]) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val merged = Upsert(spark.table(targetTable), spark.table(sourceTable), keys)
      .localCheckpoint()
    if (spark.sessionState.catalog.getTempView(targetTable).isDefined)
      merged.createOrReplaceTempView(targetTable)
    else
      merged.write.mode(SaveMode.Overwrite).saveAsTable(targetTable)
    Nil
  }
}
