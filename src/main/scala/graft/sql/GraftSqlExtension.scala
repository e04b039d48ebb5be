package graft.sql

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertIntoStatement, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.graftbridge.ExpressionBridge
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.StructType

/**
 * SQL-text DML over graft-indexed temp views.
 *
 * Register a handle as an ordinary temp view
 * (`h.toDF.createOrReplaceTempView("corpus")`) in a session built with
 * `spark.sql.extensions = graft.sql.GraftSqlExtension`, and the
 * standard DML statements route into the handle's delta-cost frame
 * methods instead of erroring out as they would for any other v1
 * relation:
 *
 *  - `MERGE INTO corpus t USING src s ON t.k = s.k WHEN MATCHED ...`
 *    → [[IndexedFrame.Handle.mergeFrame]] (source lookup-joins the
 *    index — the corpus is never scanned; one delete pass + one
 *    upsert pass apply the delta copy-on-write)
 *  - `DELETE FROM corpus WHERE <cond>` → keys =
 *    `toDF.filter(cond).select(key)` (key predicates prune through the
 *    pushed-filter lanes) then [[IndexedFrame.Handle.deleteFrame]]
 *  - `UPDATE corpus SET c = e WHERE <cond>` → read-modify-write of the
 *    affected rows through [[IndexedFrame.Handle.upsertFrame]]
 *  - `INSERT INTO corpus ...` → positional/by-name column alignment,
 *    then [[IndexedFrame.Handle.upsertFrame]] (keyed-store semantics:
 *    an existing key is replaced, matching the reference's `put`
 *    contract — reference IndexedRDD.scala:93-121); `INSERT
 *    OVERWRITE` truncates-and-loads as two COW passes
 *  - `DELETE`/`UPDATE ... WHERE <key cols> IN (SELECT ...)` — the CDC
 *    retraction/correction shapes — feed the subquery's keys into
 *    `deleteFrame` / a semi-join of the affected rows directly
 *
 * After each statement the view name is REBOUND to the new
 * copy-on-write handle, so consecutive SQL statements observe each
 * other's writes while any captured pre-DML DataFrame still reads its
 * original snapshot.
 *
 * The mechanics follow the publicly-established extension pattern for
 * bolting row-level SQL onto a non-v2 source (an injected analyzer
 * rule that rewrites the resolved `MergeIntoTable` /
 * `DeleteFromTable` / `UpdateTable` / `InsertIntoStatement` nodes into
 * `RunnableCommand`s BEFORE the analyzer's v2-only checks fire).
 * `WHEN NOT MATCHED BY SOURCE` (Delta's delete-unmatched mirroring)
 * routes too: its clauses fold with the same textual-order pinning and
 * evaluate over the corpus-kept anti join of the handle against the
 * source keys — the corpus never shuffles. Statements this rule does
 * not understand — writes to non-graft tables, non-equi ON conditions,
 * general subqueries in DML predicates, multiple UPDATE/DELETE
 * clauses, key-column updates — are left untouched for Spark to raise
 * its ordinary errors.
 */
class GraftSqlExtension extends (SparkSessionExtensions => Unit) {
  // Resolution batch (not post-hoc): the rewrite must preempt the
  // built-in post-hoc insertion rules, which raise
  // UNSUPPORTED_INSERT.NOT_ALLOWED for a non-InsertableRelation v1
  // target before an appended post-hoc rule would ever run. Extension
  // resolution rules run at the end of each fixed-point iteration, so
  // the rule fires in the first iteration where the node is resolved.
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(s => new GraftDmlRule(s))
    // the hints batch runs BEFORE resolution, which is where the
    // VERSION AS OF substitution must happen — the built-in
    // ResolveRelations throws "time travel on temp view" the moment it
    // sees the un-substituted node
    e.injectHintResolutionRule(s => new GraftTimeTravelRule(s))
    // same pre-resolution timing for index DDL: CREATE/DROP INDEX
    // carry an UnresolvedTable child, and the built-in table resolution
    // rejects temp views before a resolution-batch rule would run
    e.injectHintResolutionRule(s => new GraftIndexDdlRule(s))
    // table-valued CDC read over the recorded COW chain:
    // SELECT * FROM graft_changes('view', v1[, v2])
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_changes"),
      (args: Seq[Expression]) => GraftSqlExtension.changesPlan(args)))
    // chain inspection: SELECT * FROM graft_history('view') — one row
    // per RETAINED version (Delta's DESCRIBE HISTORY, as a TVF)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_history"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_history"),
      (args: Seq[Expression]) => GraftSqlExtension.historyPlan(args)))
    // batch probe: SELECT * FROM graft_ann_batch('table', 'index',
    // 'queries_view', 'qid_col', 'vec_col', k[, nprobe]) — one job
    // answers every row of the queries view from the durable IVF index
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ann_batch"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_ann_batch"),
      (args: Seq[Expression]) => GraftSqlExtension.annBatchPlan(args)))
    // index inspection: SELECT * FROM graft_indexes('view') — one row
    // per index (session registry for temp views; the durable manifest
    // for catalog tables, so a REOPENED session sees them too)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_indexes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_indexes"),
      (args: Seq[Expression]) => GraftSqlExtension.indexesPlan(args)))
    // durable-vector-index probe: SELECT * FROM
    // graft_ann('table', 'index', array(...), k[, nprobe]) — reads
    // only the query's nprobe list partitions (see GraftVectorIndex)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ann"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_ann"),
      (args: Seq[Expression]) => GraftSqlExtension.annPlan(args)))
    // HISTORICAL vector probe: SELECT * FROM graft_ann_at('table',
    // 'index', version, array(...), k) — exact top-k over the VERSION
    // AS OF snapshot (the index tracks the live table; see annAtPlan)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ann_at"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_ann_at"),
      (args: Seq[Expression]) => GraftSqlExtension.annAtPlan(args)))
    // export-mirror staleness probe: SELECT * FROM
    // graft_manifest_stale('table', '<dir>') — compares the mirror's
    // recorded source version against the live table version WITHOUT
    // reading any data (the GENERATE MANIFEST staleness contract)
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_manifest_stale"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_manifest_stale"),
      (args: Seq[Expression]) => GraftSqlExtension.manifestStalePlan(args)))
    // vector-index drift observability: SELECT * FROM
    // graft_index_stats('table') — one row per IVF/IVFPQ index with
    // list-size skew, live/dead entry counts, and build-version age,
    // the "is REINDEX worth O(corpus) yet" signals
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_index_stats"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, "graft_index_stats"),
      (args: Seq[Expression]) => GraftSqlExtension.indexStatsPlan(args)))
    // table-maintenance verbs Spark's grammar lacks: OPTIMIZE
    // (compaction) and VACUUM (history retention); everything else
    // passes through to the delegate parser untouched
    e.injectParser((s, p) => new GraftSqlParser(s, p))
    // the text-analysis kernels as SQL scalar functions: the SAME
    // codegen'd Column pipelines the Scala API uses (native Catalyst
    // expressions underneath — no UDF boundary), so `SELECT
    // graft_quality(text) FROM docs` plans identically to
    // `TextFunctions.qualityScore(col("text"))`
    GraftSqlExtension.sqlFunctions.foreach(e.injectFunction)
    // the indexed planner strategies ride along: an extension-configured
    // session plans zero-shuffle zip joins and no-scan aggregates over
    // handles without per-session `IndexedJoin.enable` calls — in
    // particular, graft_changes' three diff joins zip over the
    // co-partitioned COW snapshots out of the box (both enable() paths
    // stay idempotent with this)
    e.injectPlannerStrategy(_ => IndexedJoin.IndexedJoinStrategy)
    e.injectPlannerStrategy(_ => IndexedAgg.IndexedCountStrategy)
    // ...and the remaining two, completing the SQL-first surface: an
    // extension-configured session serves index-ordered ORDER BY key
    // LIMIT n (incl. keyset pagination) and per-group top-n without
    // per-session enable() calls
    e.injectPlannerStrategy(_ => IndexedTopK.IndexedTopKStrategy)
    e.injectPlannerStrategy(_ => IndexedWindow.IndexedGroupTopNStrategy)
  }
}

/** SQL-text index DDL over graft-indexed temp views, reusing Spark's
  * own `CREATE INDEX` / `DROP INDEX` grammar (shipped for DataSourceV2
  * `SupportsIndex` sources):
  *
  *  - `CREATE INDEX name ON view (col)` → [[IndexedFrame.Handle.addSecondaryIndex]]
  *    (hash inverted index: pushed equality/IN route into point probes)
  *  - `CREATE INDEX name ON view USING BTREE (col)` → ordered secondary
  *    (pushed ranges route too); `USING HASH` = the default
  *  - `CREATE INDEX name ON t USING IVF (vec)` / `USING IVFPQ (vec)` →
  *    durable vector index beside a catalog table's delta log
  *    ([[GraftVectorIndex]]; IVFPQ stores residual PQ codes)
  *  - `CREATE INDEX name ON view USING ZONEMAP (cols...)` →
  *    [[IndexedFrame.ZoneMapped.analyzeZones]] (per-partition min/max
  *    pruning on the named columns)
  *  - `DROP INDEX name ON view` → `dropSecondaryIndex` / `dropZones`
  *
  * `IF NOT EXISTS` / `IF EXISTS` behave as in SQL. Names are tracked
  * per (session, view) — only SQL-created indexes are droppable by
  * name; indexes added through the Scala API are nameless and stay
  * managed from Scala. Statements over non-graft tables (or multi-part
  * names) are left untouched for Spark's ordinary errors. Note a DML
  * rebind swaps the view to a NEW copy-on-write handle: like any
  * snapshot store, indexes belong to the handle they were built on. */
class GraftIndexDdlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedTable
  import org.apache.spark.sql.catalyst.plans.logical.{CreateIndex, DropIndex}

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case ci @ CreateIndex(u: UnresolvedTable, name, idxType, ignoreIfExists,
        columns, props) =>
      (u.multipartIdentifier match {
        case Seq(view) =>
          val cols = columns.map(_._1.name)
          if (cols.exists(_.size != 1)) None
          else GraftSqlExtension.ddlTargetFor(session, view).map {
            case (h, pathOpt) =>
              GraftIndexCommand("CREATE INDEX", view, name) { sp =>
                GraftSqlExtension.createNamedIndex(sp, view, h, name,
                  idxType, cols.map(_.head), ignoreIfExists, pathOpt,
                  props)
                // catalog tables persist the new sidecars in place —
                // the reloaded table routes through them, no rebuild
                pathOpt.foreach(
                  GraftSqlExtension.persistSidecars(sp, view, h, _))
              }
          }
        case _ => None
      }).getOrElse(ci)
    case di @ DropIndex(u: UnresolvedTable, name, ignoreIfNotExists) =>
      (u.multipartIdentifier match {
        case Seq(view) =>
          GraftSqlExtension.ddlTargetFor(session, view).map {
            case (h, pathOpt) =>
              GraftIndexCommand("DROP INDEX", view, name) { sp =>
                GraftSqlExtension.dropNamedIndex(sp, view, h, name,
                  ignoreIfNotExists, pathOpt)
                pathOpt.foreach(
                  GraftSqlExtension.persistSidecars(sp, view, h, _))
              }
          }
        case _ => None
      }).getOrElse(di)
    case p => p
  }
}

/** Eagerly-executed index DDL: runs the captured body on the driver.
  * The body lives in a second parameter list so plan equality sees
  * only (kind, view, index name). */
case class GraftIndexCommand(kind: String, view: String, indexName: String)(
    body: SparkSession => Unit) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override protected def otherCopyArgs: Seq[AnyRef] = body :: Nil
  override def run(sparkSession: SparkSession): Seq[Row] = { body(sparkSession); Nil }
  override def simpleString(maxFields: Int): String =
    s"GraftIndexCommand $kind $indexName ON $view"
}

/** `SELECT ... FROM view VERSION AS OF n` and `... TIMESTAMP AS OF t`
  * over a view whose chain the SQL-text DML recorded: substitute the
  * immutable snapshot plan (exact version, or the floor over commit
  * times — Delta's semantics). Runs in the pre-resolution hints batch;
  * unknown views/versions/pre-chain timestamps stay for Spark's
  * ordinary errors. */
class GraftTimeTravelRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation,
          None, Some(ver)) =>
        (u.multipartIdentifier match {
          case Seq(name) => scala.util.Try(ver.toLong).toOption
            .flatMap { v =>
              // in-session chain first; then the durable delta log of a
              // graft catalog table — version reads survive a reopen
              GraftSqlExtension.versionAt(session, name, v).orElse(
                GraftTables.tableInfo(session, name).flatMap { case (path, _) =>
                  // loadVersion enforces the retained window (VACUUM
                  // may have compacted early versions away)
                  scala.util.Try(
                    GraftTables.versionPlanOf(session, path, v)).toOption
                })
            }
            .map(p => SubqueryAlias(name, p))
          case _ => None
        }).getOrElse(tt)
      case tt @ org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
          u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation,
          Some(ts), None) =>
        (u.multipartIdentifier match {
          case Seq(name) => tsMillisOf(ts)
            .flatMap { ms =>
              GraftSqlExtension.versionAtTime(session, name, ms).orElse(
                GraftTables.tableInfo(session, name).flatMap { case (path, _) =>
                  val times = GraftTables.historyTimes(session, path)
                  val first = GraftTables.tableFirstVersion(session, path)
                  val i = times.lastIndexWhere(_ <= ms)
                  if (i < 0) None
                  else Some(GraftTables.versionPlanOf(session, path, first + i))
                })
            }
            .map(p => SubqueryAlias(name, p))
          case _ => None
        }).getOrElse(tt)
    }

  /** Epoch millis of a foldable TIMESTAMP AS OF argument: a timestamp
    * literal (micros), or a string parsed as `java.sql.Timestamp`
    * (the JVM-zone wall-clock form `versionTimes` round-trips).
    * Non-foldable or unparseable expressions stay for Spark. */
  private def tsMillisOf(e: Expression): Option[Long] = {
    if (!e.foldable) return None
    scala.util.Try(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty))
      .toOption.flatMap {
        case micros: Long => Some(Math.floorDiv(micros, 1000L))
        case s: org.apache.spark.unsafe.types.UTF8String =>
          scala.util.Try(java.sql.Timestamp.valueOf(s.toString).getTime).toOption
        case _ => None
      }
  }
}

/** The post-hoc DML rewrite. One instance per session. */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import IndexedFrame.{CompositeHandle, CompositeNHandle, CompositeNRelation, CompositeRelation, Handle, IndexedRelation}

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved => rewriteMerge(m).getOrElse(m)
    case d: DeleteFromTable if d.resolved => rewriteDelete(d).getOrElse(d)
    case u: UpdateTable if u.resolved => rewriteUpdate(u).getOrElse(u)
    case i: InsertIntoStatement if i.table.resolved && i.query.resolved =>
      rewriteInsert(i).getOrElse(i)
    case p => p
  }

  // ---------------------------------------------------------------- target

  /** Uniform DML surface over the concrete handle classes. Each method
    * returns the NEW handle's DataFrame, which the command rebinds to
    * the view name. */
  private trait Adapter {
    def keyCols: Seq[String]
    def schema: StructType
    def df(sp: SparkSession): DataFrame
    def upsert(sp: SparkSession, rows: DataFrame): DataFrame
    def delete(sp: SparkSession, keys: DataFrame): DataFrame
    def merge(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
        spec: MergeSpec): DataFrame
    /** [[merge]]'s change sets WITHOUT application — the catalog-table
      * path persists them as the delta log before applying. */
    def mergeSets(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
        spec: MergeSpec): IndexedFrame.MergeSets
    /** INSERT OVERWRITE: truncate-and-load as two COW passes (delete
      * every current key, then upsert the new rows) — the pre-statement
      * snapshot stays queryable like every other frame DML. */
    def overwrite(sp: SparkSession, rows: DataFrame): DataFrame
  }

  private def adapt(rel: BaseRelation): Option[Adapter] = rel match {
    case r: IndexedRelation[_] =>
      val h: Handle[_] = r.h
      Some(new Adapter {
        def keyCols: Seq[String] = Seq(h.keyCol)
        def schema: StructType = h.schema
        def df(sp: SparkSession): DataFrame = h.toDF(sp)
        def upsert(sp: SparkSession, rows: DataFrame): DataFrame =
          h.upsertFrame(rows).toDF(sp)
        def delete(sp: SparkSession, keys: DataFrame): DataFrame =
          h.deleteFrame(keys).toDF(sp)
        def merge(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
            spec: MergeSpec): DataFrame =
          h.mergeFrame(src, srcKeys.head, spec.deleteWhen, spec.updateWhen,
            spec.updateSet, spec.insertWhen, spec.insertValues,
            notBySourceDeleteWhen = spec.nbsDeleteWhen,
            notBySourceUpdateWhen = spec.nbsUpdateWhen,
            notBySourceUpdateSet = spec.nbsUpdateSet)(sp).toDF(sp)
        def mergeSets(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
            spec: MergeSpec): IndexedFrame.MergeSets =
          h.mergeChangeSets(src, srcKeys.head, spec.deleteWhen,
            spec.updateWhen, spec.updateSet, spec.insertWhen,
            spec.insertValues, insertAll = false, spec.nbsDeleteWhen,
            spec.nbsUpdateWhen, spec.nbsUpdateSet)(sp)
        def overwrite(sp: SparkSession, rows: DataFrame): DataFrame = {
          implicit val s0: SparkSession = sp
          h.deleteFrame(h.toDF.select(h.keyCol)).upsertFrame(rows).toDF(sp)
        }
      })
    case r: CompositeRelation[_, _] =>
      val h: CompositeHandle[_, _] = r.h
      Some(new Adapter {
        def keyCols: Seq[String] = Seq(h.keyColA, h.keyColB)
        def schema: StructType = h.schema
        def df(sp: SparkSession): DataFrame = h.toDF(sp)
        def upsert(sp: SparkSession, rows: DataFrame): DataFrame =
          h.upsertFrame(rows).toDF(sp)
        def delete(sp: SparkSession, keys: DataFrame): DataFrame =
          h.deleteFrame(keys).toDF(sp)
        def merge(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
            spec: MergeSpec): DataFrame =
          h.mergeFrame(src, srcKeys.head, srcKeys(1), spec.deleteWhen,
            spec.updateWhen, spec.updateSet, spec.insertWhen,
            spec.insertValues,
            notBySourceDeleteWhen = spec.nbsDeleteWhen,
            notBySourceUpdateWhen = spec.nbsUpdateWhen,
            notBySourceUpdateSet = spec.nbsUpdateSet)(sp).toDF(sp)
        def mergeSets(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
            spec: MergeSpec): IndexedFrame.MergeSets =
          h.mergeChangeSets(src, srcKeys.head, srcKeys(1), spec.deleteWhen,
            spec.updateWhen, spec.updateSet, spec.insertWhen,
            spec.insertValues, insertAll = false, spec.nbsDeleteWhen,
            spec.nbsUpdateWhen, spec.nbsUpdateSet)(sp)
        def overwrite(sp: SparkSession, rows: DataFrame): DataFrame = {
          implicit val s0: SparkSession = sp
          h.deleteFrame(h.toDF.select(h.keyColA, h.keyColB))
            .upsertFrame(rows).toDF(sp)
        }
      })
    case r: CompositeNRelation =>
      val h: CompositeNHandle = r.h
      Some(new Adapter {
        def keyCols: Seq[String] = h.keyCols
        def schema: StructType = h.schema
        def df(sp: SparkSession): DataFrame = h.toDF(sp)
        def upsert(sp: SparkSession, rows: DataFrame): DataFrame =
          h.upsertFrame(rows).toDF(sp)
        def delete(sp: SparkSession, keys: DataFrame): DataFrame =
          h.deleteFrame(keys).toDF(sp)
        def merge(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
            spec: MergeSpec): DataFrame =
          h.mergeFrame(src, srcKeys, spec.deleteWhen, spec.updateWhen,
            spec.updateSet, spec.insertWhen, spec.insertValues,
            notBySourceDeleteWhen = spec.nbsDeleteWhen,
            notBySourceUpdateWhen = spec.nbsUpdateWhen,
            notBySourceUpdateSet = spec.nbsUpdateSet)(sp).toDF(sp)
        def mergeSets(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
            spec: MergeSpec): IndexedFrame.MergeSets =
          h.mergeChangeSets(src, srcKeys, spec.deleteWhen,
            spec.updateWhen, spec.updateSet, spec.insertWhen,
            spec.insertValues, insertAll = false, spec.nbsDeleteWhen,
            spec.nbsUpdateWhen, spec.nbsUpdateSet)(sp)
        def overwrite(sp: SparkSession, rows: DataFrame): DataFrame = {
          implicit val s0: SparkSession = sp
          h.deleteFrame(h.toDF.select(h.keyCols.head, h.keyCols.tail: _*))
            .upsertFrame(rows).toDF(sp)
        }
      })
    case _ => None
  }

  /** A catalog-table adapter that reads the LIVE snapshot: the
    * analyzed plan's LogicalRelation is whatever this session's
    * relation cache resolved — possibly versions behind a rival
    * session's commits — and change sets computed from a stale
    * snapshot are lost updates waiting to commit (GraftStressSpec's
    * N-writer increment race found exactly that). Every operation
    * re-resolves the current handle at RUN time; the rewrite-time
    * `bound` adapter only supplies schema/key metadata (schema drift
    * between rewrite and run is guarded by the commit's own
    * staged-compatibility check). */
  private def liveAdapter(path: String, bound: Adapter): Adapter =
    new Adapter {
      private def live(sp: SparkSession): Adapter =
        adapt(GraftTables.current(sp, path)._2.relation(sp))
          .getOrElse(bound)
      def keyCols: Seq[String] = bound.keyCols
      def schema: StructType = bound.schema
      def df(sp: SparkSession): DataFrame = live(sp).df(sp)
      def upsert(sp: SparkSession, rows: DataFrame): DataFrame =
        live(sp).upsert(sp, rows)
      def delete(sp: SparkSession, keys: DataFrame): DataFrame =
        live(sp).delete(sp, keys)
      def merge(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
          spec: MergeSpec): DataFrame =
        live(sp).merge(sp, src, srcKeys, spec)
      def mergeSets(sp: SparkSession, src: DataFrame, srcKeys: Seq[String],
          spec: MergeSpec): IndexedFrame.MergeSets =
        live(sp).mergeSets(sp, src, srcKeys, spec)
      def overwrite(sp: SparkSession, rows: DataFrame): DataFrame =
        live(sp).overwrite(sp, rows)
    }

  /** Where a DML statement's effect lands: a temp VIEW rebinds to the
    * new copy-on-write handle in-session; a CATALOG table (`CREATE
    * TABLE ... USING graft`) commits the change sets to the table's
    * on-disk delta log so the statement survives the session. */
  private sealed trait DmlTarget
  private case class ViewTarget(name: String) extends DmlTarget
  private case class TableTarget(
      ident: org.apache.spark.sql.catalyst.TableIdentifier,
      path: String) extends DmlTarget

  /** Resolve a DML target subtree to (rebind target, graft adapter).
    * A LogicalRelation carrying catalogTable metadata is a persistent
    * graft table — its location is the delta-log root. Otherwise the
    * innermost naming node wins — for `MERGE INTO v t` the target
    * reads SubqueryAlias(t) > SubqueryAlias(v) > View(v) > Relation,
    * and the view identity `v` is what the command rebinds. INSERT
    * targets lose the View wrapper entirely during relation
    * resolution, so a bare graft relation falls back to a reverse
    * lookup over the session's temp views (same relation INSTANCE —
    * a handle registered under two names rebinds the one referenced). */
  private def dest(p: LogicalPlan): Option[(DmlTarget, Adapter)] = {
    var name: Option[String] = None
    var cur = p
    while (true) {
      cur match {
        case SubqueryAlias(id, c) => name = Some(id.name); cur = c
        case v: View => name = Some(v.desc.identifier.table); cur = v.child
        case lr: LogicalRelation =>
          return adapt(lr.relation).flatMap { a =>
            lr.catalogTable match {
              case Some(ct) =>
                val path = ct.location.toString
                Some((TableTarget(ct.identifier, path),
                  liveAdapter(path, a)))
              case None =>
                name.orElse(viewNameOf(lr.relation))
                  .map(n => (ViewTarget(n), a))
            }
          }
        case _ => return None
      }
    }
    None
  }

  private def viewNameOf(rel: BaseRelation): Option[String] = {
    val cat = session.sessionState.catalog
    cat.getTempViewNames().find { n =>
      cat.getTempView(n).exists(_.exists {
        case lr: LogicalRelation => lr.relation eq rel
        case _ => false
      })
    }
  }

  // ----------------------------------------------------------- expressions

  /** Remap a resolved DML expression to an unresolved Column over the
    * s/t-aliased join view `mergeFrame` builds internally: target
    * attrs → `t.<name>`, source attrs → `s.<name>`. None when the
    * expression carries a subquery or an attribute from neither side
    * (both mean "not a shape we route"). */
  private def remapJoined(e: Expression, tgt: AttributeSet,
      src: AttributeSet): Option[Column] = remapWith(e) {
    case a: AttributeReference if tgt.contains(a) =>
      UnresolvedAttribute(Seq("t", a.name))
    case a: AttributeReference if src.contains(a) =>
      UnresolvedAttribute(Seq("s", a.name))
  }

  /** Single-frame twin of [[remapJoined]]: every attribute of `allowed`
    * becomes an unqualified name over that frame. */
  private def remapPlain(e: Expression, allowed: AttributeSet): Option[Column] =
    remapWith(e) {
      case a: AttributeReference if allowed.contains(a) =>
        UnresolvedAttribute(Seq(a.name))
    }

  private def remapWith(e: Expression)(
      pf: PartialFunction[Expression, Expression]): Option[Column] = {
    if (e.exists(_.isInstanceOf[SubqueryExpression])) return None
    // BETWEEN resolves through a With(CommonExpressionDef) wrapper
    // whose memoized refs break once we swap its attributes for
    // unresolved names (With.withNewChildrenInternal calls dataType on
    // the rewritten def) — desugar to the plain conjunction first;
    // any other With-carrying expression declines the rewrite rather
    // than failing analysis downstream
    val pre = e.transform {
      case b: org.apache.spark.sql.catalyst.expressions.Between =>
        And(GreaterThanOrEqual(b.input, b.lower),
          LessThanOrEqual(b.input, b.upper))
    }
    if (pre.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.With])) return None
    val t = pre.transform(pf)
    if (t.exists(_.isInstanceOf[AttributeReference])) None
    else Some(ExpressionBridge.column(t))
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case x => Seq(x)
  }

  /** The ON condition must be exactly one equality per key column
    * (`t.<key> = <source expr>`, either side), nothing else. Returns
    * key column → source-side expression. */
  private def keyEqs(cond: Expression, keyCols: Seq[String],
      tgt: AttributeSet, src: AttributeSet): Option[Map[String, Expression]] = {
    val m = scala.collection.mutable.Map.empty[String, Expression]
    splitConj(cond).foreach {
      case EqualTo(a: AttributeReference, rhs) if tgt.contains(a) &&
          keyCols.contains(a.name) && !m.contains(a.name) &&
          rhs.references.subsetOf(src) => m(a.name) = rhs
      case EqualTo(lhs, a: AttributeReference) if tgt.contains(a) &&
          keyCols.contains(a.name) && !m.contains(a.name) &&
          lhs.references.subsetOf(src) => m(a.name) = lhs
      case _ => return None
    }
    if (keyCols.forall(m.contains)) Some(m.toMap) else None
  }

  // ----------------------------------------------------------------- MERGE

  private[sql] case class MergeSpec(deleteWhen: Option[Column],
      updateWhen: Option[Column], updateSet: Map[String, Column],
      insertWhen: Option[Column], insertValues: Map[String, Column],
      nbsDeleteWhen: Option[Column] = None,
      nbsUpdateWhen: Option[Column] = None,
      nbsUpdateSet: Map[String, Column] = Map.empty)

  /** Fold the action lists into `mergeFrame`'s one-clause-per-kind
    * shape. SQL's textual-order precedence is preserved by pinning each
    * later clause's effective condition with the negation of every
    * earlier (NULL-pinned) condition, which also makes the delete and
    * update sets disjoint — so `mergeFrame`'s delete-then-upsert
    * application order matches SQL regardless of clause order. An
    * unconditional clause makes later MATCHED clauses dead; they are
    * dropped. Shapes outside one UPDATE + one DELETE + one INSERT
    * return None (not intercepted). */
  private def clauseSpecs(m: MergeIntoTable, keyCols: Seq[String],
      schema: StructType, tgt: AttributeSet, src: AttributeSet)
      : Option[MergeSpec] = {
    var delW: Option[Column] = None
    var updW: Option[Column] = None
    var updSet = Map.empty[String, Column]
    var priorNeg: Option[Column] = None
    var matchedDone = false
    for (a <- m.matchedActions if !matchedDone) {
      val ownC = a.condition match {
        case Some(e) => remapJoined(e, tgt, src) match {
          case Some(c) => coalesce(c, lit(false))
          case None => return None
        }
        case None => lit(true)
      }
      val effC = priorNeg.map(_ && ownC).getOrElse(ownC)
      a match {
        case DeleteAction(_) =>
          if (delW.nonEmpty) return None
          delW = Some(effC)
        case UpdateAction(_, assigns, _) =>
          if (updW.nonEmpty) return None
          val pairs = assigns.map {
            case Assignment(k: AttributeReference, v) if tgt.contains(k) &&
                !keyCols.contains(k.name) =>
              // assignment values are NOT type-aligned by the analyzer
              // for a v1 target — cast to the column's type here
              remapJoined(v, tgt, src)
                .map(c => k.name -> c.cast(schema(k.name).dataType))
            case _ => None
          }
          if (pairs.exists(_.isEmpty)) return None
          updW = Some(effC)
          updSet = pairs.flatten.toMap
        case _ => return None // star action the analyzer did not expand
      }
      if (a.condition.isEmpty) matchedDone = true
      else priorNeg = Some(priorNeg.map(_ && !ownC).getOrElse(!ownC))
    }
    var insW: Option[Column] = None
    var insVals = Map.empty[String, Column]
    m.notMatchedActions match {
      case Seq() =>
      case Seq(InsertAction(cond, assigns)) =>
        val pairs = assigns.map {
          case Assignment(k: AttributeReference, v) if tgt.contains(k) =>
            remapJoined(v, tgt, src)
              .map(c => k.name -> c.cast(schema(k.name).dataType))
          case _ => None
        }
        if (pairs.exists(_.isEmpty)) return None
        insVals = pairs.flatten.toMap
        insW = cond match {
          case Some(e) => remapJoined(e, tgt, src) match {
            case s @ Some(_) => s
            case None => return None
          }
          case None => Some(lit(true))
        }
      case _ => return None // >1 NOT MATCHED clause
    }
    // WHEN NOT MATCHED BY SOURCE: same textual-order folding as the
    // MATCHED clauses, but conditions/values may reference ONLY target
    // columns (remapPlain leaves a source attribute unmapped → None →
    // not intercepted, matching the analyzer's own restriction) — they
    // evaluate over the corpus-kept anti join's plain-named rows
    var nbsDelW: Option[Column] = None
    var nbsUpdW: Option[Column] = None
    var nbsUpdSet = Map.empty[String, Column]
    var nbsPriorNeg: Option[Column] = None
    var nbsDone = false
    for (a <- m.notMatchedBySourceActions if !nbsDone) {
      val ownC = a.condition match {
        case Some(e) => remapPlain(e, tgt) match {
          case Some(c) => coalesce(c, lit(false))
          case None => return None
        }
        case None => lit(true)
      }
      val effC = nbsPriorNeg.map(_ && ownC).getOrElse(ownC)
      a match {
        case DeleteAction(_) =>
          if (nbsDelW.nonEmpty) return None
          nbsDelW = Some(effC)
        case UpdateAction(_, assigns, _) =>
          if (nbsUpdW.nonEmpty) return None
          val pairs = assigns.map {
            case Assignment(k: AttributeReference, v) if tgt.contains(k) &&
                !keyCols.contains(k.name) =>
              remapPlain(v, tgt)
                .map(c => k.name -> c.cast(schema(k.name).dataType))
            case _ => None
          }
          if (pairs.exists(_.isEmpty)) return None
          nbsUpdW = Some(effC)
          nbsUpdSet = pairs.flatten.toMap
        case _ => return None
      }
      if (a.condition.isEmpty) nbsDone = true
      else nbsPriorNeg = Some(nbsPriorNeg.map(_ && !ownC).getOrElse(!ownC))
    }
    if (delW.isEmpty && updSet.isEmpty && insVals.isEmpty &&
      nbsDelW.isEmpty && nbsUpdSet.isEmpty) return None
    Some(MergeSpec(delW, updW, updSet, insW, insVals,
      nbsDelW, nbsUpdW, nbsUpdSet))
  }

  private def rewriteMerge(m: MergeIntoTable): Option[LogicalPlan] = {
    val tgt = AttributeSet(m.targetTable.output)
    val src = AttributeSet(m.sourceTable.output)
    for {
      (target, ad) <- dest(m.targetTable)
      eqs <- keyEqs(m.mergeCondition, ad.keyCols, tgt, src)
      spec <- clauseSpecs(m, ad.keyCols, ad.schema, tgt, src)
      srcKeyCols <- sourceKeyPlan(ad.keyCols, eqs, src)
    } yield {
      val srcPlan = m.sourceTable
      target match {
        case ViewTarget(view) =>
          GraftDmlCommand("MERGE", view) { sp =>
            val srcDF0 = ExpressionBridge.ofRows(sp, srcPlan)
            val (srcDF, names) = srcKeyCols(srcDF0)
            ad.merge(sp, srcDF, names, spec)
          }
        case TableTarget(ident, path) =>
          GraftTableDmlCommand("MERGE", ident, path) { sp =>
            val rv = GraftTables.currentVersion(sp, path)
            val srcDF0 = ExpressionBridge.ofRows(sp, srcPlan)
            val (srcDF, names) = srcKeyCols(srcDF0)
            val ms = ad.mergeSets(sp, srcDF, names, spec)
            try GraftTables.commitChange(sp, path, truncate = false,
              ms.del, ms.ups, readVersion = Some(rv))
            finally ms.release()
          }
      }
    }
  }

  /** `mergeFrame` wants source KEY COLUMN NAMES. A bare attribute uses
    * its own column; any other source-side expression (e.g. a coercion
    * cast) is projected onto the source frame first. */
  private def sourceKeyPlan(keyCols: Seq[String],
      eqs: Map[String, Expression], src: AttributeSet)
      : Option[DataFrame => (DataFrame, Seq[String])] = {
    val steps = keyCols.zipWithIndex.map { case (kc, i) =>
      eqs(kc) match {
        case a: AttributeReference => Some((None: Option[Column], a.name))
        case e =>
          val nm = s"__graft_mkey_$i"
          remapPlain(e, src).map(c => (Some(c): Option[Column], nm))
      }
    }
    if (steps.exists(_.isEmpty)) return None
    val got = steps.flatten
    Some { df0 =>
      val df = got.foldLeft(df0) {
        case (d, (Some(c), nm)) => d.withColumn(nm, c)
        case (d, (None, _)) => d
      }
      (df, got.map(_._2))
    }
  }

  // ---------------------------------------------------------------- DELETE

  private def rewriteDelete(d: DeleteFromTable): Option[LogicalPlan] =
    dest(d.table).flatMap { case (target, ad) =>
      val tgt = AttributeSet(d.table.output)
      // the delete-key frame is the same for both target kinds; only
      // where it lands differs (view rebind vs durable delta commit)
      def command(keysOf: SparkSession => DataFrame): LogicalPlan =
        target match {
          case ViewTarget(view) =>
            GraftDmlCommand("DELETE", view)(sp => ad.delete(sp, keysOf(sp)))
          case TableTarget(ident, path) =>
            GraftTableDmlCommand("DELETE", ident, path) { sp =>
              val rv = GraftTables.currentVersion(sp, path)
              GraftTables.commitChange(sp, path, truncate = false,
                Some(keysOf(sp)), None, readVersion = Some(rv))
            }
        }
      d.condition match {
        // `DELETE FROM t WHERE <key cols> IN (SELECT ...)` — the CDC
        // retraction shape: the subquery's keys feed deleteFrame
        // directly (null keys match nothing in SQL and are dropped)
        case org.apache.spark.sql.catalyst.expressions.InSubquery(values,
            lq: org.apache.spark.sql.catalyst.expressions.ListQuery)
            if values.forall(_.isInstanceOf[AttributeReference]) &&
              values.map(_.asInstanceOf[AttributeReference]).forall(tgt.contains) &&
              values.map(_.asInstanceOf[AttributeReference].name) == ad.keyCols =>
          val subPlan = lq.plan
          Some(command { sp =>
            val sub0 = ExpressionBridge.ofRows(sp, subPlan)
            val keyTypes = ad.keyCols.map(ad.schema(_).dataType)
            sub0.na.drop().select(
              sub0.columns.toSeq.zip(keyTypes).zipWithIndex.map {
                case ((c, dt), i) => sub0.col(s"`$c`").cast(dt).as(ad.keyCols(i))
              }: _*)
          })
        case cond =>
          remapPlain(cond, tgt).map { condC =>
            command(sp => ad.df(sp).filter(condC)
              .select(ad.keyCols.map(col): _*))
          }
      }
    }

  // ---------------------------------------------------------------- UPDATE

  private def rewriteUpdate(u: UpdateTable): Option[LogicalPlan] = {
    val tgt = AttributeSet(u.table.output)
    for {
      (target, ad) <- dest(u.table)
      affected <- affectedSelector(u.condition, tgt, ad)
      assigns <- {
        val pairs = u.assignments.map {
          case Assignment(k: AttributeReference, v) if tgt.contains(k) &&
              !ad.keyCols.contains(k.name) =>
            remapPlain(v, tgt).map(k.name -> _)
          case _ => None
        }
        if (pairs.exists(_.isEmpty)) None else Some(pairs.flatten.toMap)
      }
    } yield {
      def upsOf(sp: SparkSession): DataFrame = {
        val outCols = ad.schema.fields.map { f =>
          assigns.get(f.name) match {
            case Some(c) => c.cast(f.dataType).as(f.name)
            case None => col(f.name)
          }
        }
        affected(sp).select(outCols.toIndexedSeq: _*)
      }
      target match {
        case ViewTarget(view) =>
          GraftDmlCommand("UPDATE", view)(sp => ad.upsert(sp, upsOf(sp)))
        case TableTarget(ident, path) =>
          GraftTableDmlCommand("UPDATE", ident, path) { sp =>
            val rv = GraftTables.currentVersion(sp, path)
            GraftTables.commitChange(sp, path, truncate = false,
              None, Some(upsOf(sp)), readVersion = Some(rv))
          }
      }
    }
  }

  /** The rows an UPDATE's WHERE selects: a plain remappable predicate
    * filters the frame directly; `<key cols> IN (SELECT ...)` —
    * the CDC-correction shape — semi-joins the subquery's keys
    * instead (null keys match nothing). Anything else falls through. */
  private def affectedSelector(cond: Option[Expression], tgt: AttributeSet,
      ad: Adapter): Option[SparkSession => DataFrame] = cond match {
    case None => Some(sp => ad.df(sp))
    case Some(org.apache.spark.sql.catalyst.expressions.InSubquery(values,
        lq: org.apache.spark.sql.catalyst.expressions.ListQuery))
        if values.forall(_.isInstanceOf[AttributeReference]) &&
          values.map(_.asInstanceOf[AttributeReference]).forall(tgt.contains) &&
          values.map(_.asInstanceOf[AttributeReference].name) == ad.keyCols =>
      val subPlan = lq.plan
      Some { sp =>
        val sub0 = ExpressionBridge.ofRows(sp, subPlan)
        val keyTypes = ad.keyCols.map(ad.schema(_).dataType)
        val keys = sub0.na.drop().select(
          sub0.columns.toSeq.zip(keyTypes).zipWithIndex.map {
            case ((c, dt), i) => sub0.col(s"`$c`").cast(dt).as(ad.keyCols(i))
          }: _*)
        ad.df(sp).join(keys, ad.keyCols, "left_semi")
      }
    case Some(e) => remapPlain(e, tgt).map(c => (sp: SparkSession) =>
      ad.df(sp).filter(c))
  }

  // ---------------------------------------------------------------- INSERT

  private def rewriteInsert(i: InsertIntoStatement): Option[LogicalPlan] = {
    if (i.partitionSpec.nonEmpty || i.ifPartitionNotExists) return None
    for {
      (target, ad) <- dest(i.table)
      pick <- insertAlignment(i, ad.schema)
    } yield {
      val qPlan = i.query
      val kind = if (i.overwrite) "INSERT OVERWRITE" else "INSERT"
      def alignedOf(sp: SparkSession): DataFrame = {
        val q0 = ExpressionBridge.ofRows(sp, qPlan)
        // positional rename first: VALUES/SELECT output names are
        // synthetic (and can contain dots), so never resolve by them
        val q = q0.toDF(q0.columns.indices.map(i => s"__graft_ins_$i"): _*)
        q.select(ad.schema.fields.map { f =>
          pick(f.name) match {
            case Some(srcIdx) => col(s"__graft_ins_$srcIdx").cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }.toIndexedSeq: _*)
      }
      target match {
        case ViewTarget(view) =>
          GraftDmlCommand(kind, view) { sp =>
            if (i.overwrite) ad.overwrite(sp, alignedOf(sp))
            else ad.upsert(sp, alignedOf(sp))
          }
        case TableTarget(ident, path) =>
          GraftTableDmlCommand(kind, ident, path) { sp =>
            val rv = GraftTables.currentVersion(sp, path)
            GraftTables.commitChange(sp, path, truncate = i.overwrite,
              None, Some(alignedOf(sp)), readVersion = Some(rv))
          }
      }
    }
  }

  /** target column name → source POSITION (stable across re-wrapping
    * the query plan; names in a VALUES list are synthetic). None for
    * shapes we refuse: arity mismatch, unknown or duplicate column in
    * the user column list, a missing KEY column. */
  private def insertAlignment(i: InsertIntoStatement,
      schema: StructType): Option[String => Option[Int]] = {
    val out = i.query.output
    val fields = schema.fieldNames
    val map: Map[String, Int] =
      if (i.userSpecifiedCols.nonEmpty) {
        if (i.userSpecifiedCols.size != out.size) return None
        if (i.userSpecifiedCols.exists(c => !fields.contains(c))) return None
        if (i.userSpecifiedCols.distinct.size != i.userSpecifiedCols.size)
          return None
        i.userSpecifiedCols.zipWithIndex.toMap
      } else if (i.byName) {
        if (out.map(_.name).exists(n => !fields.contains(n))) return None
        out.map(_.name).zipWithIndex.toMap
      } else {
        if (out.size != schema.size) return None
        fields.zipWithIndex.toMap
      }
    Some(map.get _)
  }
}

/** Eagerly-executed DML command: runs the captured body (frame-level
  * delta DML + view rebind) on the driver; the statement itself
  * returns no rows. The body lives in a second parameter list so plan
  * equality/canonicalization sees only (kind, view). */
case class GraftDmlCommand(kind: String, view: String)(
    body: SparkSession => DataFrame) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override protected def otherCopyArgs: Seq[AnyRef] = body :: Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    // the view's CURRENT plan is version max before this statement; the
    // chain seeds with it on the first DML so `VERSION AS OF 0` is the
    // pre-DML state
    val before = sparkSession.sessionState.catalog.getTempView(view)
      .map(_.child)
    val next = body(sparkSession)
    next.createOrReplaceTempView(view)
    GraftSqlExtension.recordRebind(sparkSession, view, before,
      next.queryExecution.analyzed)
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftDmlCommand $kind $view"
}

/** [[GraftDmlCommand]]'s catalog-table twin: the captured body commits
  * the statement's change sets to the table's on-disk delta log (see
  * [[GraftTables.commitChange]]) instead of rebinding a view, then the
  * cached table relation is dropped so the next resolution reads the
  * new version. Durable: a session reopened on the same location
  * replays to the identical state. */
case class GraftTableDmlCommand(kind: String,
    ident: org.apache.spark.sql.catalyst.TableIdentifier, path: String)(
    body: SparkSession => Unit) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override protected def otherCopyArgs: Seq[AnyRef] = body :: Nil
  override def run(sparkSession: SparkSession): Seq[Row] = {
    body(sparkSession)
    sparkSession.sessionState.catalog.refreshTable(ident)
    // rival sessions' relation caches would keep serving the
    // pre-commit snapshot — invalidate them too (their next query
    // re-resolves; a session without this table ignores the refresh)
    GraftTables.knownSessions.filter(_ ne sparkSession).foreach { s =>
      try s.sessionState.catalog.refreshTable(ident)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    Nil
  }
  override def simpleString(maxFields: Int): String =
    s"GraftTableDmlCommand $kind ${ident.unquotedString}"
}

object GraftSqlExtension {
  /** Per-(session, view) COW version chains, appended by every SQL-text
    * DML statement: index 0 is the state before the first statement,
    * each statement adds its result — so `SELECT ... FROM view VERSION
    * AS OF n` time-travels the chain for free (snapshots are immutable
    * copy-on-write handles; keeping a plan alive pins its index, which
    * IS the versioned-store contract). Weak-keyed on the session so
    * chains die with it. */
  private[sql] final case class Chain(first: Long,
      entries: Vector[(LogicalPlan, Long)]) {
    /** One past the newest version number (== total versions ever
      * recorded; `first > 0` after a VACUUM dropped history). */
    def next: Long = first + entries.length
  }

  private val chains =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Chain]]()

  private def chainOf(sp: SparkSession)
      : scala.collection.concurrent.TrieMap[String, Chain] =
    chains.synchronized {
      var m = chains.get(sp)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        chains.put(sp, m)
      }
      m
    }

  private[sql] def recordRebind(sp: SparkSession, view: String,
      before: Option[LogicalPlan], after: LogicalPlan): Unit = {
    val m = chainOf(sp)
    val cur = m.getOrElse(view, Chain(0L, Vector.empty))
    // the chain CONTINUES only if the view still points at its last
    // recorded version; a name re-bound externally (a fresh
    // createOrReplaceTempView over a new handle) starts a NEW chain —
    // otherwise VERSION AS OF / graft_changes would read versions of a
    // dead binding (observed: a second pipeline reusing a view name in
    // one session diffed the FIRST pipeline's snapshots)
    val continues = cur.entries.nonEmpty &&
      before.exists(b => cur.entries.last._1 == b)
    // the commit time: version n becomes current NOW; the seed entry
    // (the pre-DML state) shares the first commit's stamp, so a
    // TIMESTAMP AS OF earlier than every commit errors like Delta's
    // "before the earliest version" instead of silently flooring
    val now = System.currentTimeMillis()
    val seeded =
      if (continues) cur
      else Chain(0L, before.toVector.map(_ -> now))
    m.put(view, seeded.copy(entries = seeded.entries :+ (after -> now)))
    ()
  }

  private[sql] def versionAt(sp: SparkSession, view: String,
      v: Long): Option[LogicalPlan] =
    chainOf(sp).get(view).flatMap { ch =>
      val i = v - ch.first
      if (i >= 0 && i < ch.entries.length) Some(ch.entries(i.toInt)._1)
      else None
    }

  /** The chain version current AT `tsMillis` — the largest RETAINED
    * version whose commit time is <= it (Delta's floor semantics);
    * None when the timestamp predates the retained chain or no chain
    * exists. */
  private[sql] def versionAtTime(sp: SparkSession, view: String,
      tsMillis: Long): Option[LogicalPlan] =
    chainOf(sp).get(view).flatMap { ch =>
      val i = ch.entries.lastIndexWhere(_._2 <= tsMillis)
      if (i < 0) None else Some(ch.entries(i)._1)
    }

  /** Number of versions ever recorded for a view (0 = no SQL DML yet;
    * the current version is this minus one — stable across VACUUM). */
  def versionCount(sp: SparkSession, view: String): Int =
    chainOf(sp).get(view).map(_.next.toInt).getOrElse(0)

  /** Oldest version still readable (> 0 after a VACUUM dropped
    * history; version numbers never renumber, like Delta's). */
  def firstVersion(sp: SparkSession, view: String): Long =
    chainOf(sp).get(view).map(_.first).getOrElse(0L)

  /** Commit time (epoch millis) of each RETAINED version, oldest
    * first (index 0 is version [[firstVersion]]), for mapping wall
    * clocks to `TIMESTAMP AS OF` reads (version 0, the pre-DML seed,
    * shares version 1's stamp). */
  def versionTimes(sp: SparkSession, view: String): Seq[Long] =
    chainOf(sp).get(view).map(_.entries.map(_._2)).getOrElse(Nil)

  /** Drop all but the newest `retain` versions of `view`'s chain —
    * the engine under SQL `VACUUM`. Version numbers are stable: the
    * retained tail keeps its numbers, and `VERSION AS OF`/`TIMESTAMP
    * AS OF` reads of dropped versions fail like Delta's "version no
    * longer exists". Dropped snapshot plans become unreachable from
    * the chain; their cached blocks are reclaimed by Spark's
    * ContextCleaner once no user reference pins them (run `OPTIMIZE`
    * first so the current version stops depending on ancestor
    * lineage, then VACUUM actually frees the chain). Returns
    * (versions dropped, new first version, current version) — zeros
    * when the view has no recorded chain. */
  private[sql] def vacuumChain(sp: SparkSession, view: String,
      retain: Int): (Long, Long, Long) = {
    require(retain >= 1, s"VACUUM must retain at least 1 version (got $retain)")
    val m = chainOf(sp)
    m.get(view) match {
      case None => (0L, 0L, -1L)
      case Some(ch) =>
        val drop = math.max(0, ch.entries.length - retain)
        val nw = Chain(ch.first + drop, ch.entries.drop(drop))
        m.put(view, nw)
        (drop.toLong, nw.first, nw.next - 1)
    }
  }

  // ---------------------------------------------------------- index DDL

  private type DdlHandle =
    IndexedFrame.SecondaryCapable[_] with IndexedFrame.ZoneMapped

  /** Per-(session, view) registry of SQL-created indexes:
    * (view, index name) → (normalized type, columns). Weak-keyed on the
    * session like the version chains. */
  private val indexRegs =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), (String, Seq[String])]]()

  private def indexRegOf(sp: SparkSession)
      : scala.collection.concurrent.TrieMap[(String, String), (String, Seq[String])] =
    indexRegs.synchronized {
      var m = indexRegs.get(sp)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        indexRegs.put(sp, m)
      }
      m
    }

  /** SQL-created indexes on `view`: (name, type, columns), name-sorted. */
  def indexesOn(sp: SparkSession, view: String): Seq[(String, String, Seq[String])] =
    indexRegOf(sp).iterator.collect {
      case ((v, n), (t, cs)) if v == view => (n, t, cs)
    }.toSeq.sortBy(_._1)

  /** The DDL target behind `view`: a temp-view handle (sidecars live
    * in memory with the handle), or a persistent catalog table's live
    * handle together with its location — index DDL against a table
    * persists the sidecars so the routing survives a reopen, and the
    * durable name manifest hydrates this session's registry so later
    * sessions can DROP indexes created before them. */
  private[sql] def ddlTargetFor(sp: SparkSession,
      view: String): Option[(DdlHandle, Option[String])] =
    handleFor(sp, view).map((_, None)).orElse(
      GraftTables.tableInfo(sp, view).map { case (path, _) =>
        hydrateIndexNames(sp, view, path)
        (GraftTables.current(sp, path)._2.handleAny.asInstanceOf[DdlHandle],
          Some(path))
      })

  /** Re-persist a catalog table's secondary/zone sidecars after SQL
    * index DDL mutated them, plus the `_indexnames` manifest mapping
    * SQL index names to (type, columns) — index names on catalog
    * tables are durable, unlike the session-scoped view names. */
  private[sql] def persistSidecars(sp: SparkSession, view: String,
      h: DdlHandle, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      sp.sparkContext.hadoopConfiguration)
    IndexedFrame.saveIndexSidecars(h, path, fs)
    // the persisted postings/zones reflect the CURRENT version, not
    // necessarily the base save's — record which, so a reopened
    // historical read never routes through future postings (false
    // negatives); absent marker = the base version (every saveTo path)
    graft.MarkerFile.writeLong(fs,
      new org.apache.hadoop.fs.Path(path, "_sidecarver"),
      GraftTables.currentVersion(sp, path))
    // atomic rewrite (staged sibling + rename) — a concurrent reader
    // never sees a truncated manifest
    GraftTables.writeIndexManifest(sp, path,
      indexesOn(sp, view).map { case (n, t, cs) => (n, t, cs.toList) })
  }

  /** Reconcile this session's registry with a catalog table's
    * `_indexnames` manifest. Disk is the TRUTH for catalog tables —
    * every in-session DDL rewrites the manifest immediately — so this
    * handles a reopened session (names hydrate) AND a location that
    * was dropped and recreated mid-session (stale names purge). */
  private def hydrateIndexNames(sp: SparkSession, view: String,
      path: String): Unit = {
    val onDisk: Map[String, (String, List[String])] =
      GraftTables.readIndexManifest(sp, path)
        .map { case (n, t, cs) => n -> (t, cs) }.toMap
    val reg = indexRegOf(sp)
    reg.keys.filter(k => k._1 == view && !onDisk.contains(k._2))
      .foreach(reg.remove)
    onDisk.foreach { case (n, (t, cs)) => reg.put((view, n), (t, cs)) }
  }

  /** The graft handle behind a temp view, when the view is a plain
    * wrapper over one indexed relation (single-key, composite, or
    * N-ary — all carry the secondary-index and zone-map surfaces). */
  private[sql] def handleFor(sp: SparkSession, view: String): Option[DdlHandle] =
    sp.sessionState.catalog.getTempView(view).flatMap(_.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if graftHandleOf(lr.relation).isDefined => graftHandleOf(lr.relation).get
    })

  private def graftHandleOf(rel: BaseRelation): Option[DdlHandle] = rel match {
    case r: IndexedFrame.IndexedRelation[_] => Some(r.h)
    case r: IndexedFrame.CompositeRelation[_, _] => Some(r.h)
    case r: IndexedFrame.CompositeNRelation => Some(r.h)
    case _ => None
  }

  private[sql] def createNamedIndex(sp: SparkSession, view: String,
      h: DdlHandle, name: String, idxType: String, cols: Seq[String],
      ignoreIfExists: Boolean, pathOpt: Option[String] = None,
      props: Map[String, String] = Map.empty): Unit = {
    val reg = indexRegOf(sp)
    if (reg.contains((view, name))) {
      if (!ignoreIfExists)
        throw new IllegalArgumentException(
          s"index '$name' already exists on view '$view'")
      return
    }
    val norm = idxType.toLowerCase match {
      case "" | "hash" => "hash"
      case "btree" | "ordered" => "btree"
      case "zonemap" => "zonemap"
      case "ivf" => "ivf"
      case "ivfpq" => "ivfpq"
      case other => throw new IllegalArgumentException(
        s"unsupported index type '$other' (USE: HASH, BTREE, ZONEMAP, IVF, IVFPQ)")
    }
    norm match {
      case "zonemap" => h.analyzeZones(cols: _*)
      case t @ ("ivf" | "ivfpq") =>
        require(cols.size == 1,
          s"an ${t.toUpperCase} index takes exactly one vector column (got ${cols.size})")
        val path = pathOpt.getOrElse(throw new IllegalArgumentException(
          s"${t.toUpperCase} indexes persist beside the table's delta log — the " +
            "target must be a durable graft CATALOG table, not a temp view"))
        val (v, th) = GraftTables.current(sp, path)
        require(th.schema(cols.head).dataType
          .isInstanceOf[org.apache.spark.sql.types.ArrayType],
          s"${t.toUpperCase} index column '${cols.head}' must be an array vector " +
            s"(got ${th.schema(cols.head).dataType.catalogString})")
        val nlist = props.getOrElse("nlist", "16").toInt
        if (t == "ivfpq")
          GraftVectorIndex.buildPq(sp, path, name, th.toDF(sp), th.keyCols,
            cols.head, nlist, props.getOrElse("m", "8").toInt,
            props.getOrElse("ks", "16").toInt, v)
        else
          GraftVectorIndex.build(sp, path, name, th.toDF(sp), th.keyCols,
            cols.head, nlist, v)
      case t =>
        require(cols.size == 1,
          s"a $t index takes exactly one column (got ${cols.size}); " +
            "ZONEMAP indexes take several")
        h.addSecondaryIndex(cols.head, ordered = t == "btree")
    }
    reg.put((view, name), (norm, cols))
    ()
  }

  private[sql] def dropNamedIndex(sp: SparkSession, view: String,
      h: DdlHandle, name: String, ignoreIfNotExists: Boolean,
      pathOpt: Option[String] = None): Unit =
    indexRegOf(sp).remove((view, name)) match {
      case Some(("zonemap", cols)) => h.dropZones(cols: _*); ()
      case Some(("ivf" | "ivfpq", _)) =>
        pathOpt.foreach(GraftVectorIndex.drop(sp, _, name))
      case Some((_, cols)) => h.dropSecondaryIndex(cols.head); ()
      case None =>
        if (!ignoreIfNotExists)
          throw new NoSuchElementException(
            s"no index '$name' on view '$view'")
    }

  // --------------------------------------------------- CDC changes TVF

  /** Key columns of the graft relation inside a recorded version plan. */
  private def keyColsOf(p: LogicalPlan): Option[Seq[String]] =
    p.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if relKeyCols(lr.relation).isDefined => relKeyCols(lr.relation).get
    }

  private def relKeyCols(rel: BaseRelation): Option[Seq[String]] = rel match {
    case r: IndexedFrame.IndexedRelation[_] => Some(Seq(r.h.keyCol))
    case r: IndexedFrame.CompositeRelation[_, _] =>
      Some(Seq(r.h.keyColA, r.h.keyColB))
    case r: IndexedFrame.CompositeNRelation => Some(r.h.keyCols)
    case _ => None
  }

  /** `SELECT * FROM graft_changes('view', v1[, v2])` — the Delta-style
    * CDC read over the COW chain the SQL-text DML records: every
    * column of the view plus `_change_type` ∈ insert / delete /
    * update_preimage / update_postimage, comparing version v1 to v2
    * (default: the latest). Because consecutive versions are
    * co-partitioned copy-on-write snapshots of indexed handles, the
    * three key equi-joins underneath (two anti, one inner) route
    * through the indexed zip-join strategy — the diff never shuffles
    * either snapshot. Rows equal in every non-key column are not
    * changes and do not appear. */
  private[sql] def changesPlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    def evalArg(e: Expression): Any = {
      require(e.foldable, "graft_changes arguments must be literals")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    require(args.size == 2 || args.size == 3,
      "usage: graft_changes(view, fromVersion[, toVersion])")
    val view = evalArg(args(0)) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_changes: view name must be a string literal (got $other)")
    }
    def ver(a: Any): Long = a match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"graft_changes: version must be an integer literal (got $other)")
    }
    // in-session chain first; a graft CATALOG table's on-disk delta
    // log serves when no chain exists — CDC reads survive a reopen
    val tableLog = GraftTables.tableInfo(sp, view)
    val n = versionCount(sp, view) match {
      case 0 => tableLog.map(_._2.toInt + 1).getOrElse(
        throw new IllegalArgumentException(
          s"'$view' has no recorded versions — graft_changes reads the " +
            "chain SQL-text DML statements record (temp view or graft table)"))
      case k => k
    }
    val v1 = ver(evalArg(args(1)))
    val v2 = if (args.size == 3) ver(evalArg(args(2))) else (n - 1).toLong
    def at(v: Long): LogicalPlan = versionAt(sp, view, v)
      .orElse(tableLog.map { case (path, _) =>
        GraftTables.versionPlanOf(sp, path, v) // enforces the retained window
      })
      .getOrElse(throw new IllegalArgumentException(
        s"no version $v for '$view' " +
          s"(have ${firstVersion(sp, view)}..${n - 1})"))
    val (oldP, newP) = (at(v1), at(v2))
    val keys = keyColsOf(newP).orElse(keyColsOf(oldP)).getOrElse(
      throw new IllegalArgumentException(
        s"view '$view' versions are not graft-indexed relations"))
    val o0raw = ExpressionBridge.ofRows(sp, oldP)
    val nw0 = ExpressionBridge.ofRows(sp, newP)
    // a RENAME/DROP evolution between the endpoints leaves the old
    // side under old names — remap it positionally through the
    // persisted schema chain (catalog tables; in-session chains have
    // no evolution verbs) so the diff binds and emits under the NEW
    // names
    val o0 =
      if (o0raw.columns.sameElements(nw0.columns.take(o0raw.columns.length)))
        o0raw
      else tableLog.map { case (path, _) =>
        GraftTables.remapAcross(sp, path, v1, v2, o0raw) }.getOrElse(o0raw)
    // schema evolution is append-only: diff under the WIDER column set,
    // NULL-filling the narrower side, so a change visible only in an
    // added column still reports (and pre/post images carry the full
    // current schema)
    val wideSchema =
      if (nw0.schema.length >= o0.schema.length) nw0.schema else o0.schema
    def widen(df: DataFrame): DataFrame =
      if (df.schema.length == wideSchema.length) df
      else df.select(wideSchema.fields.toIndexedSeq.map(f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)): _*)
    val o = widen(o0)
    val nw = widen(nw0)
    val cols = wideSchema.fieldNames.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    def tag(df: DataFrame, t: String): DataFrame =
      df.select(cols.map(col) :+ lit(t).as("_change_type"): _*)
    val inserted = tag(nw.join(o, keys, "left_anti"), "insert")
    val deleted = tag(o.join(nw, keys, "left_anti"), "delete")
    val all =
      if (nonKeys.isEmpty) inserted.unionByName(deleted)
      else {
        // side-qualified refs (o(c) / nw(c)) stay unambiguous across
        // the same-named columns: the versions are distinct relations
        val diff = o.join(nw, keys.map(k => o(k) === nw(k)).reduce(And2),
            "inner")
          .where(nonKeys.map(c => !(o(c) <=> nw(c))).reduce(Or2))
        val pre = diff.select(
          cols.map(c => o(c).as(c)) :+ lit("update_preimage").as("_change_type"): _*)
        val post = diff.select(
          cols.map(c => nw(c).as(c)) :+ lit("update_postimage").as("_change_type"): _*)
        inserted.unionByName(deleted).unionByName(pre).unionByName(post)
      }
    all.queryExecution.analyzed
  }

  /** `SELECT * FROM graft_ann('table', 'index', array(q...), k[,
    * nprobe[, filter]])` — probe a durable IVF or IVFPQ vector index
    * ([[GraftVectorIndex]]): the k nearest live rows by cosine, read
    * from only the query's `nprobe` list partitions (IVFPQ reads only
    * PQ codes there and re-ranks its shortlist against the live
    * primary). `nprobe` defaults to 4; pass the index's nlist for
    * EXACT brute-force-equal top-k (IVF) / the full deterministic
    * ADC+re-rank (IVFPQ). The optional `filter` string is a SQL
    * predicate over the table's columns (filtered vector search): the
    * k best among MATCHING rows, applied before top-k. */
  private[sql] def annPlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    require(args.size >= 4 && args.size <= 6,
      "usage: graft_ann(table, index, query_vector, k[, nprobe[, filter]])")
    def evalArg(e: Expression): Any = {
      require(e.foldable, "graft_ann arguments must be literals")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    def str(a: Any, what: String): String = a match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_ann: $what must be a string literal (got $other)")
    }
    def int(a: Any, what: String): Int = a match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_ann: $what must be an integer literal (got $other)")
    }
    val table = str(evalArg(args(0)), "table name")
    val index = str(evalArg(args(1)), "index name")
    val query: Array[Double] = (args(2).dataType, evalArg(args(2))) match {
      case (org.apache.spark.sql.types.ArrayType(et, _),
          a: org.apache.spark.sql.catalyst.util.ArrayData) => et match {
        case org.apache.spark.sql.types.DoubleType => a.toDoubleArray()
        case org.apache.spark.sql.types.FloatType =>
          a.toFloatArray().map(_.toDouble)
        case org.apache.spark.sql.types.IntegerType =>
          a.toIntArray().map(_.toDouble)
        case org.apache.spark.sql.types.LongType =>
          a.toLongArray().map(_.toDouble)
        case dt: org.apache.spark.sql.types.DecimalType =>
          // a SQL array(0.12, ...) literal parses as exact decimals
          a.toObjectArray(dt).map(
            _.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
        case other => throw new IllegalArgumentException(
          s"graft_ann: unsupported query element type $other")
      }
      case (dt, _) => throw new IllegalArgumentException(
        s"graft_ann: the query must be a numeric array literal (got $dt)")
    }
    val k = int(evalArg(args(3)), "k")
    val nprobe = if (args.size >= 5) int(evalArg(args(4)), "nprobe") else 4
    // 6th arg: FILTERED vector search — a SQL predicate over the
    // table's columns constraining the pool BEFORE top-k (the k best
    // among matching rows, evaluated against the live snapshot)
    val pred = if (args.size == 6) Some(str(evalArg(args(5)), "filter"))
      else None
    val (path, _) = GraftTables.tableInfo(sp, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft_ann: '$table' is not a graft catalog table"))
    val (_, h) = GraftTables.current(sp, path)
    GraftVectorIndex.probe(sp, path, index, h.toDF(sp), h.keyCols,
      query, k, nprobe, pred).queryExecution.analyzed
  }

  /** `SELECT * FROM graft_history('view')`: one row per RETAINED
    * chain version — (version, commit_time, is_current) — oldest
    * first. Version numbers are stable across VACUUM (dropped
    * versions simply stop appearing), commit times are the wall
    * clocks `TIMESTAMP AS OF` floors against. */
  private[sql] def historyPlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    require(args.size == 1, "usage: graft_history(view)")
    require(args.head.foldable, "graft_history: view name must be a literal")
    val view = args.head.eval(
        org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_history: view name must be a string literal (got $other)")
    }
    val chainTimes = versionTimes(sp, view)
    // catalog-table fallback: history survives a reopen via the log
    val (first, times) =
      if (chainTimes.nonEmpty) (firstVersion(sp, view), chainTimes)
      else GraftTables.tableInfo(sp, view) match {
        case Some((path, _)) =>
          (GraftTables.tableFirstVersion(sp, path),
            GraftTables.historyTimes(sp, path))
        case None => throw new IllegalArgumentException(
          s"'$view' has no recorded versions — graft_history reads the " +
            "chain SQL-text DML statements record (temp view or graft table)")
      }
    val out = Seq(
      AttributeReference("version", org.apache.spark.sql.types.LongType,
        nullable = false)(),
      AttributeReference("commit_time",
        org.apache.spark.sql.types.TimestampType, nullable = false)(),
      AttributeReference("is_current",
        org.apache.spark.sql.types.BooleanType, nullable = false)())
    val rows = times.zipWithIndex.map { case (millis, i) =>
      org.apache.spark.sql.catalyst.InternalRow(
        first + i, millis * 1000L, i == times.length - 1)
    }
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(out, rows)
  }

  /** `SELECT * FROM graft_ann_batch('table', 'index', 'queries_view',
    * 'qid_col', 'vec_col', k[, nprobe[, 'filter']])` — BATCH probe of
    * a durable IVF or IVFPQ index ([[GraftVectorIndex.probeBatch]]):
    * the k nearest live rows for EVERY row of `queries_view` (any
    * resolvable view/table with an id column and a numeric-array
    * vector column), one job, the lists scan statically pruned to the
    * union of the queries' probed list partitions. The optional
    * `filter` is a SQL predicate over the TABLE's columns with
    * graft_ann's pool-before-top-k semantics, applied per query.
    * Returns (qid_col, key columns..., cos). `nprobe` defaults to 4;
    * nlist is exact per query. */
  private[sql] def annBatchPlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    require(args.size >= 6 && args.size <= 8,
      "usage: graft_ann_batch(table, index, queries_view, query_id_col, " +
        "vec_col, k[, nprobe[, filter]])")
    def evalArg(e: Expression): Any = {
      require(e.foldable, "graft_ann_batch arguments must be literals")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    def str(a: Any, what: String): String = a match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_ann_batch: $what must be a string literal (got $other)")
    }
    def int(a: Any, what: String): Int = a match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_ann_batch: $what must be an integer literal (got $other)")
    }
    val table = str(evalArg(args(0)), "table name")
    val index = str(evalArg(args(1)), "index name")
    val queriesView = str(evalArg(args(2)), "queries view name")
    val qidCol = str(evalArg(args(3)), "query id column")
    val vecCol = str(evalArg(args(4)), "vector column")
    val k = int(evalArg(args(5)), "k")
    val nprobe = if (args.size >= 7) int(evalArg(args(6)), "nprobe") else 4
    val pred = if (args.size == 8)
      Some(str(evalArg(args(7)), "filter predicate")) else None
    val queries = sp.table(queriesView)
    val (path, _) = GraftTables.tableInfo(sp, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft_ann_batch: '$table' is not a graft catalog table"))
    val (_, h) = GraftTables.current(sp, path)
    GraftVectorIndex.probeBatch(sp, path, index, h.toDF(sp), h.keyCols,
      queries, qidCol, vecCol, k, nprobe, pred).queryExecution.analyzed
  }

  /** `SELECT * FROM graft_indexes('view')`: one row per index —
    * (name, kind, columns) — name-sorted. Temp views list the
    * session's index registry; graft CATALOG tables fall back to the
    * durable index-name manifest, so a REOPENED session sees exactly
    * the indexes its DML maintains (Delta's SHOW TBLPROPERTIES-ish
    * observability, typed). */
  private[sql] def indexesPlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    require(args.size == 1, "usage: graft_indexes(view)")
    require(args.head.foldable, "graft_indexes: view name must be a literal")
    val view = args.head.eval(
        org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_indexes: view name must be a string literal (got $other)")
    }
    val reg = indexesOn(sp, view)
    val entries: Seq[(String, String, Seq[String])] =
      if (reg.nonEmpty) reg
      else GraftTables.tableInfo(sp, view) match {
        case Some((path, _)) => GraftTables.readIndexManifest(sp, path)
          .map { case (n, t, cs) => (n, t, cs: Seq[String]) }
          .sortBy(_._1)
        case None => Seq.empty
      }
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val out = Seq(
      AttributeReference("name", StringType, nullable = false)(),
      AttributeReference("kind", StringType, nullable = false)(),
      AttributeReference("columns", StringType, nullable = false)())
    val rows = entries.map { case (n, t, cs) =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(n), UTF8String.fromString(t),
        UTF8String.fromString(cs.mkString(",")))
    }
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(out, rows)
  }

  /** `SELECT * FROM graft_ann_at('table', 'index', version,
    * array(q...), k)` — the HISTORICAL vector probe: exact cosine
    * top-k over the `VERSION AS OF` snapshot's content. The durable
    * index tracks the LIVE table (updated vectors replace their old
    * assignments), so a historical probe cannot be served from the
    * current lists without silently wrong results; instead this scans
    * the versioned snapshot exactly — O(snapshot), the honest cost of
    * reproducing a past retrieval run — while validating the index
    * exists and reading the vector column from its meta. Output is
    * [[annPlan]]'s (key columns..., cos). */
  private[sql] def annAtPlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    require(args.size == 5,
      "usage: graft_ann_at(table, index, version, query_vector, k)")
    def evalArg(e: Expression): Any = {
      require(e.foldable, "graft_ann_at arguments must be literals")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    def str(a: Any, what: String): String = a match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_ann_at: $what must be a string literal (got $other)")
    }
    def long(a: Any, what: String): Long = a match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"graft_ann_at: $what must be an integer literal (got $other)")
    }
    val table = str(evalArg(args(0)), "table name")
    val index = str(evalArg(args(1)), "index name")
    val version = long(evalArg(args(2)), "version")
    val query: Array[Double] = (args(3).dataType, evalArg(args(3))) match {
      case (org.apache.spark.sql.types.ArrayType(et, _),
          a: org.apache.spark.sql.catalyst.util.ArrayData) => et match {
        case org.apache.spark.sql.types.DoubleType => a.toDoubleArray()
        case org.apache.spark.sql.types.FloatType =>
          a.toFloatArray().map(_.toDouble)
        case org.apache.spark.sql.types.IntegerType =>
          a.toIntArray().map(_.toDouble)
        case org.apache.spark.sql.types.LongType =>
          a.toLongArray().map(_.toDouble)
        case dt: org.apache.spark.sql.types.DecimalType =>
          a.toObjectArray(dt).map(
            _.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
        case other => throw new IllegalArgumentException(
          s"graft_ann_at: unsupported query element type $other")
      }
      case (dt, _) => throw new IllegalArgumentException(
        s"graft_ann_at: the query must be a numeric array literal (got $dt)")
    }
    val k = long(evalArg(args(4)), "k").toInt
    val (path, _) = GraftTables.tableInfo(sp, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft_ann_at: '$table' is not a graft catalog table"))
    GraftVectorIndex.probeAt(sp, path, index, version, query, k)
      .queryExecution.analyzed
  }

  /** `SELECT * FROM graft_manifest_stale('table', '<dir>')` — the
    * GENERATE MANIFEST staleness contract: one row
    * (table, location, exported_version, table_version, stale),
    * answered from the mirror's recorded source version and the
    * table's version marker — NO data reads. `exported_version` is -1
    * when the dir holds no mirror of THIS table (also stale). */
  private[sql] def manifestStalePlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    require(args.size == 2, "usage: graft_manifest_stale(table, dest_dir)")
    def str(e: Expression, what: String): String = {
      require(e.foldable, s"graft_manifest_stale: $what must be a literal")
      e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_manifest_stale: $what must be a string literal (got $other)")
      }
    }
    val table = str(args(0), "table name")
    val dest = str(args(1), "dest dir")
    val (path, cur) = GraftTables.tableInfo(sp, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft_manifest_stale: '$table' is not a graft catalog table"))
    val exported = GraftManifest.exportedVersion(sp, path, dest)
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val out = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("location", StringType, nullable = false)(),
      AttributeReference("exported_version", LongType, nullable = false)(),
      AttributeReference("table_version", LongType, nullable = false)(),
      AttributeReference("stale", BooleanType, nullable = false)())
    val rows = Seq(org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(table), UTF8String.fromString(dest),
      exported.getOrElse(-1L), cur, !exported.contains(cur)))
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(out, rows)
  }

  /** `SELECT * FROM graft_index_stats('table')` — drift observability
    * for the durable vector indexes: one row per IVF/IVFPQ index with
    * (name, kind, vector_column, nlist, build_version, table_version,
    * commits_since_build, entries, live_entries, dead_entries,
    * list_rows_max, list_rows_mean, list_skew). `list_skew`
    * (max/mean over the LIVE per-list sizes) is the "when is REINDEX
    * worth O(corpus)" signal: a drifted distribution piles new vectors
    * into few lists, recall at fixed nprobe decays, and the skew rises
    * ahead of it. O(index) by design — an observability scan, never on
    * a query path. */
  private[sql] def indexStatsPlan(args: Seq[Expression]): LogicalPlan = {
    val sp = SparkSession.active
    require(args.size == 1, "usage: graft_index_stats(table)")
    require(args.head.foldable,
      "graft_index_stats: table name must be a literal")
    val table = args.head.eval(
        org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_index_stats: table name must be a string literal (got $other)")
    }
    val (path, cur) = GraftTables.tableInfo(sp, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft_index_stats: '$table' is not a graft catalog table"))
    val (_, h) = GraftTables.current(sp, path)
    val vecIdx = GraftTables.readIndexManifest(sp, path)
      .filter(e => e._2 == "ivf" || e._2 == "ivfpq").map(_._1).sorted
    val stats = vecIdx.flatMap(n =>
      GraftVectorIndex.stats(sp, path, n, h.toDF(sp), h.keyCols))
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType,
      StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val out = Seq(
      AttributeReference("name", StringType, nullable = false)(),
      AttributeReference("kind", StringType, nullable = false)(),
      AttributeReference("vector_column", StringType, nullable = false)(),
      AttributeReference("nlist", IntegerType, nullable = false)(),
      AttributeReference("build_version", LongType, nullable = false)(),
      AttributeReference("table_version", LongType, nullable = false)(),
      AttributeReference("commits_since_build", LongType, nullable = false)(),
      AttributeReference("entries", LongType, nullable = false)(),
      AttributeReference("live_entries", LongType, nullable = false)(),
      AttributeReference("dead_entries", LongType, nullable = false)(),
      AttributeReference("list_rows_max", LongType, nullable = false)(),
      AttributeReference("list_rows_mean", DoubleType, nullable = false)(),
      AttributeReference("list_skew", DoubleType, nullable = false)())
    val rows = stats.map { s =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(s.name), UTF8String.fromString(s.kind),
        UTF8String.fromString(s.vecCol), s.nlist, s.buildVersion, cur,
        math.max(0L, cur - s.buildVersion), s.entries, s.liveEntries,
        s.entries - s.liveEntries, s.listMax, s.listMean, s.listSkew)
    }
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(out, rows)
  }

  private val And2 = (a: Column, b: Column) => a && b
  private val Or2 = (a: Column, b: Column) => a || b

  // ------------------------------------------------- SQL scalar functions

  /** The text-analysis surface as SQL functions — each builder wraps
    * the argument expression in a Column, applies the SAME combinator
    * the Scala API exposes, and unwraps: zero new code paths, the
    * codegen'd kernels plan identically from SQL text. */
  private[sql] val sqlFunctions: Seq[(
      org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] = {
    import graft.functions.TextFunctions
    def one(name: String, usage: String)(f: Column => Column) = (
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftSqlExtension].getName, null, name, usage, "", "", "",
        "", "", "", "internal"),
      (args: Seq[Expression]) => {
        if (args.size != 1) throw new IllegalArgumentException(
          s"$name takes exactly one argument (got ${args.size})")
        // deep conversion: the combinators build node-backed Columns,
        // and a function-builder expression never passes through the
        // DataFrame plan-conversion path that substitutes them lazily
        ExpressionBridge.expressionDeep(f(ExpressionBridge.column(args.head)))
      })
    Seq(
      one("graft_quality", "graft_quality(text) - composite quality score in [0, 1]")(
        TextFunctions.qualityScore(_)),
      one("graft_langid", "graft_langid(text) - heuristic language id")(
        TextFunctions.langId),
      one("graft_token_count", "graft_token_count(text) - whitespace token count")(
        TextFunctions.tokenCount),
      one("graft_subword_count", "graft_subword_count(text) - letter/digit/punct run count")(
        TextFunctions.subwordCount),
      one("graft_fingerprint", "graft_fingerprint(text) - rolling token-stream fingerprint")(
        TextFunctions.fingerprint),
      one("graft_redact", "graft_redact(text) - emails/URLs/phones masked")(
        TextFunctions.redactPii),
      one("graft_simhash", "graft_simhash(text) - 62-bit near-dup simhash")(
        graft.pipeline.Dedup.simhashColumn))
  }
}
