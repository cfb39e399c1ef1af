package graft.plans

import java.nio.file.Files
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Filter, InsertIntoStatement, LocalRelation, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.command.RunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{Catalog, IcebergLite, IcebergTransforms}

/** SQL-visible lakehouse tables: `SELECT ... FROM graft.db.t` with
  * time travel and metadata pruning, `INSERT INTO` / `INSERT
  * OVERWRITE`, and namespace/table DDL — the SQL face of
  * [[graft.sources.Catalog]] (itself the analogue of the reference's
  * metastore client, `/root/reference/src/metastore/mod.rs:16-86`;
  * the reference's CLI resolves names the same way before planning).
  *
  * Wiring: register the catalog name with
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalogPlugin].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/path/to/catalog")
  * }}}
  * Three cooperating pieces, all injected by [[GraftExtensions]]:
  *
  *  1. [[GraftCatalogPlugin]] — a Spark `TableCatalog` +
  *     `SupportsNamespaces` over the catalog JSON, powering DDL
  *     (`CREATE NAMESPACE` / `CREATE TABLE` / `SHOW TABLES` /
  *     `DROP TABLE` / `ALTER TABLE RENAME`). Its `loadTable` throws
  *     `NoSuchTableException` BY DESIGN: reads do not go through a
  *     DSv2 scan (which would re-implement parquet reading) but
  *     through rule 2, keeping Spark's vectorized reader + codegen.
  *  2. [[GraftSqlResolution]] (analyzer rule) — resolves the
  *     still-unresolved relation to the table's [[IcebergLite.read]]
  *     plan wrapped in a [[GraftRelation]] marker; resolves `VERSION
  *     AS OF <snap|'ref'>` / `TIMESTAMP AS OF` through
  *     [[IcebergLite.resolveRef]] / [[IcebergLite.snapshotAsOf]], and
  *     `INSERT INTO`/`OVERWRITE` to a [[GraftInsertCommand]].
  *  3. [[GraftMetadataPrune]] (optimizer rule, operator-optimization
  *     batch) — when a `Filter` lands directly on the marker, its
  *     supported conjuncts re-plan the file list through partition /
  *     manifest-summary / file-bounds skipping
  *     ([[IcebergLite.filtersFromExpression]]), so a SQL `WHERE` on a
  *     partition or clustered column reads only the surviving files —
  *     at 100 TB the difference between scanning a table and scanning
  *     a day. The FULL predicate stays row-level on top (pruning can
  *     only skip work, never change results), and the marker is
  *     removed either way so column pruning / filter pushdown reach
  *     the parquet scan within the same optimizer batch.
  */
case class GraftRelation(tablePath: String, snapshotId: Option[Long],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftRelation =
    copy(child = newChild)
}

object GraftSqlCatalog {
  /** Catalog root for `name` iff `name` is registered as a graft
    * catalog in this session. */
  def rootFor(spark: SparkSession, name: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .filter(_ == classOf[GraftCatalogPlugin].getName)
      .flatMap(_ => spark.conf.getOption(s"spark.sql.catalog.$name.root"))

  /** DDL-declared schema of a table that has no snapshot yet: the
    * table layer is schema-on-write, but `CREATE TABLE (cols)` has to
    * mean something before the first insert — the first INSERT aligns
    * to this declaration, and a SELECT on the still-empty table
    * returns zero rows WITH the declared columns. Superseded by the
    * snapshot schema the moment data lands. */
  private def declaredFile(tablePath: String) =
    java.nio.file.Paths.get(tablePath, "metadata", "declared-schema.json")

  def declareSchema(tablePath: String, schema: StructType): Unit =
    Files.writeString(declaredFile(tablePath), schema.json)

  def declaredSchema(tablePath: String): Option[StructType] = {
    val p = declaredFile(tablePath)
    if (!Files.exists(p)) None
    else org.apache.spark.sql.types.DataType.fromJson(Files.readString(p)) match {
      case s: StructType => Some(s)
      case _ => None
    }
  }

  /** (catalogRoot, tablePath) when `parts` names a registered graft
    * table; None leaves the relation for Spark's normal resolution
    * (and its standard TABLE_OR_VIEW_NOT_FOUND error). */
  def resolve(spark: SparkSession, parts: Seq[String]): Option[String] =
    if (parts.length != 3) None
    else rootFor(spark, parts.head).flatMap { root =>
      try Some(Catalog.tablePath(root, parts(1), parts(2)))
      catch { case _: IllegalArgumentException => None }
    }
}

/** Analyzer rule: name resolution + time travel + INSERT routing. */
case class GraftSqlResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def relationFor(path: String, snapshotId: Option[Long]): LogicalPlan = {
    val plan = IcebergLite.read(spark, path, snapshotId).queryExecution.analyzed
    if (plan.output.nonEmpty) GraftRelation(path, snapshotId, plan)
    else GraftSqlCatalog.declaredSchema(path) match {
      // empty table: zero rows with the DDL-declared columns
      case Some(s) => LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(s))
      case None => plan
    }
  }

  /** `VERSION AS OF` takes a snapshot id or a branch/tag name;
    * `TIMESTAMP AS OF` resolves through the commit-time parent walk
    * (latest ancestor at or before the requested instant). */
  private def snapFor(path: String, timestamp: Option[Expression],
      version: Option[String]): Option[Long] = version match {
    case Some(v) if v.nonEmpty && v.forall(_.isDigit) => Some(v.toLong)
    case Some(v) => Some(IcebergLite.resolveRef(path, v))
    case None => timestamp.map { e =>
      require(e.foldable, s"TIMESTAMP AS OF must be a constant, got $e")
      val cast = Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))
      val micros = cast.eval(null)
      require(micros != null, s"TIMESTAMP AS OF evaluated to null: $e")
      IcebergLite.snapshotAsOf(path, micros.asInstanceOf[Long] / 1000L)
        .getOrElse(throw new IllegalArgumentException(
          s"no snapshot of $path at or before ${e.sql}"))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case i @ InsertIntoStatement(UnresolvedRelation(parts, _, _), partSpec,
        userCols, query, overwrite, _, byName) if query.resolved &&
        GraftSqlCatalog.resolve(spark, parts).isDefined =>
      require(partSpec.isEmpty,
        "static PARTITION clauses are unsupported; partitioned graft tables " +
          "derive layout from their own spec (dynamic overwrite)")
      require(userCols.isEmpty || byName,
        "INSERT with an explicit column list is supported BY NAME only")
      GraftInsertCommand(GraftSqlCatalog.resolve(spark, parts).get, query,
        overwrite, byName)
    case RelationTimeTravel(UnresolvedRelation(parts, _, _), ts, ver)
        if GraftSqlCatalog.resolve(spark, parts).isDefined =>
      val path = GraftSqlCatalog.resolve(spark, parts).get
      relationFor(path, snapFor(path, ts, ver))
    case UnresolvedRelation(parts, _, false)
        if GraftSqlCatalog.resolve(spark, parts).isDefined =>
      relationFor(GraftSqlCatalog.resolve(spark, parts).get, None)
    // ALTER TABLE ... RENAME TO: the V2 path needs loadTable (which
    // this catalog refuses by design — see GraftCatalogPlugin), so the
    // statement resolves here instead, to a name-only catalog move
    case org.apache.spark.sql.catalyst.plans.logical.RenameTable(
        org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView(parts, _, _),
        newName, false)
        if parts.length == 3 && GraftSqlCatalog.rootFor(spark, parts.head).isDefined =>
      require(newName.length == 1 ||
        (newName.length == 3 && newName.take(2) == parts.take(2)),
        "RENAME cannot move a table across databases or catalogs")
      GraftRenameTableCommand(GraftSqlCatalog.rootFor(spark, parts.head).get,
        parts(1), parts(2), newName.last)
  }
}

case class GraftRenameTableCommand(root: String, db: String,
    from: String, to: String) extends RunnableCommand {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan = this
  override def run(spark: SparkSession): Seq[Row] = {
    Catalog.renameTable(root, db, from, to)
    Nil
  }
}

/** Optimizer rule (operator-optimization batch): metadata pruning for
  * SQL predicates, then marker removal. Runs inside the batch's fixed
  * point, so the subplan it substitutes still receives column pruning
  * and parquet filter pushdown afterwards. */
case class GraftMetadataPrune(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(cond, GraftRelation(path, snap, child)) =>
      val metaFilters = IcebergLite.filtersFromExpression(cond)
      if (metaFilters.isEmpty) Filter(cond, child)
      else {
        // optimizedPlan, NOT analyzed: this splice happens after the
        // early optimizer batches, so e.g. the read's broadcast
        // ResolvedHint must already be eliminated in the subtree
        val planned = IcebergLite.read(spark, path, snap, metaFilters)
          .queryExecution.optimizedPlan
        if (planned.output.isEmpty)
          // every file pruned: metadata-only empty result with the
          // original attributes (read() loses the schema on empty)
          LocalRelation(child.output)
        else {
          val byName = planned.output.map(a => a.name -> a).toMap
          // splice under the ORIGINAL exprIds so references above the
          // filter keep resolving
          val remap = child.output.map { o =>
            val n = byName(o.name)
            Alias(if (n.dataType == o.dataType) n else Cast(n, o.dataType),
              o.name)(exprId = o.exprId)
          }
          Filter(cond, Project(remap, planned))
        }
      }
    case GraftRelation(_, _, child) => child
  }
}

/** `INSERT INTO` appends; `INSERT OVERWRITE` is dynamic-partition
  * replacement on spec-partitioned tables ([[IcebergLite.overwrite]]
  * semantics: partitions present in the query's result are replaced,
  * the rest carried verbatim). Source columns align positionally
  * (`BY NAME` by name), cast to the table's logical schema; a first
  * insert into an empty, spec-less table defines the schema. */
case class GraftInsertCommand(tablePath: String, query: LogicalPlan,
    overwrite: Boolean, byName: Boolean) extends RunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = query :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan = this

  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftColumnBridge.toDF(spark, query)
    // the table's READ schema is the alignment truth — it has renames
    // applied and identity-partition source columns recovered (the
    // snapshot data schema alone lacks those); the DDL declaration
    // only contributes COLUMN ORDER (the read appends recovered
    // partition columns last, the declaration puts them where the
    // user wrote them). Types always come from the live schema so
    // later type-widening is honored over a stale declaration.
    val live = Option(IcebergLite.read(spark, tablePath).schema).filter(_.nonEmpty)
    val declared = GraftSqlCatalog.declaredSchema(tablePath)
    val logical: Option[StructType] = (live, declared) match {
      case (Some(l), Some(d)) if d.fieldNames.sorted.sameElements(l.fieldNames.sorted) =>
        Some(StructType(d.fieldNames.map(n => l(l.fieldIndex(n)))))
      case (Some(l), _) => Some(l)
      case (None, d) => d
    }
    val aligned = logical match {
      case Some(schema) =>
        require(src.columns.length == schema.length,
          s"INSERT column count ${src.columns.length} != table ${schema.length}")
        val positioned =
          if (byName) {
            val missing = schema.fieldNames.filterNot(src.columns.contains)
            require(missing.isEmpty, s"BY NAME insert missing ${missing.mkString(", ")}")
            src.select(schema.fieldNames.toSeq.map(col): _*)
          } else src.toDF(schema.fieldNames.toSeq: _*)
        positioned.select(schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
      case None => src
    }
    if (overwrite) {
      require(IcebergLite.partitionSpec(tablePath).nonEmpty,
        "INSERT OVERWRITE needs a partition spec (dynamic overwrite); " +
          "unpartitioned full rewrites go through delete + insert")
      IcebergLite.overwrite(spark, tablePath, aligned, Nil)
    } else IcebergLite.append(spark, tablePath, aligned)
    Nil
  }
}

/** Spark `TableCatalog` over the catalog JSON: DDL + name listing.
  * `loadTable` intentionally reports no-such-table so reads resolve
  * through [[GraftSqlResolution]] (see class doc). */
class GraftCatalogPlugin extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null, s"spark.sql.catalog.$name.root must point at the catalog dir")
    Catalog.init(root)
  }
  override def name(): String = catalogName

  private def db(namespace: Array[String]): String = {
    if (namespace.length != 1) throw new NoSuchNamespaceException(namespace.toSeq)
    namespace.head
  }

  // ------------------------------------------------------- namespaces
  override def listNamespaces(): Array[Array[String]] =
    Catalog.listDatabases(root).map(Array(_)).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else { loadNamespaceMetadata(namespace); Array.empty }
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (Catalog.listDatabases(root).contains(db(namespace))) new util.HashMap()
    else throw new NoSuchNamespaceException(namespace.toSeq)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    Catalog.createDatabase(root, db(namespace))
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = db(namespace)
    if (!Catalog.listDatabases(root).contains(d)) false
    else {
      val tables = Catalog.listTables(root, d)
      require(cascade || tables.isEmpty,
        s"namespace $d is not empty: ${tables.mkString(", ")}")
      tables.foreach(Catalog.dropTable(root, d, _, purge = false))
      Catalog.dropDatabase(root, d)
      true
    }
  }

  // ----------------------------------------------------------- tables
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    loadNamespaceMetadata(namespace)
    Catalog.listTables(root, db(namespace))
      .map(Identifier.of(namespace, _)).toArray
  }
  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      Catalog.listDatabases(root).contains(ident.namespace.head) &&
      Catalog.listTables(root, ident.namespace.head).contains(ident.name)
  /** Reads route through [[GraftSqlResolution]], not a DSv2 scan. */
  override def loadTable(ident: Identifier): Table =
    throw new NoSuchTableException(ident)
  override def loadTable(ident: Identifier, version: String): Table =
    throw new NoSuchTableException(ident)
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new NoSuchTableException(ident)
  /** `PARTITIONED BY` clauses map onto the hidden-partitioning spec:
    * bare columns are identity transforms; `years/months/days/hours
    * (col)`, `bucket(n, col)` and `truncate(w, col)` are the Iceberg
    * transforms [[graft.sources.IcebergTransforms]] implements. */
  private def toSpecField(t: Transform,
      schema: StructType): IcebergTransforms.PartitionField = {
    import IcebergTransforms._
    val colName = t.references().head.fieldNames().mkString(".")
    val srcType = schema.fields.find(_.name == colName).getOrElse(
      throw new IllegalArgumentException(
        s"partition column $colName is not in the table schema")).dataType
    def intArg: Int = t.arguments().collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value().toString.toInt
    }.getOrElse(throw new IllegalArgumentException(s"$t needs an int argument"))
    val transform = t.name() match {
      case "identity" => Identity
      case "years" => Year
      case "months" => Month
      case "days" => Day
      case "hours" => Hour
      case "bucket" => Bucket(intArg)
      case "truncate" => Truncate(intArg)
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform $other")
    }
    PartitionField(colName, transform, srcType)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val path = Catalog.createTable(root, db(ident.namespace), ident.name,
      Option(properties.get(TableCatalog.PROP_LOCATION)))
    if (partitions.nonEmpty)
      IcebergLite.createTable(path, partitions.toSeq.map(toSpecField(_, schema)))
    // the table layer is schema-on-write; record the declaration so
    // the first INSERT aligns to it (GraftSqlCatalog.declaredSchema)
    if (schema.nonEmpty) GraftSqlCatalog.declareSchema(path, schema)
    val (n, s) = (ident.toString, schema)
    new Table {
      override def name(): String = n
      override def schema(): StructType = s
      override def capabilities(): util.Set[TableCapability] = new util.HashSet()
    }
  }
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE goes through IcebergLite's evolution API")
  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else { Catalog.dropTable(root, ident.namespace.head, ident.name); true }
  override def purgeTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else { Catalog.dropTable(root, ident.namespace.head, ident.name, purge = true); true }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(oldIdent.namespace.sameElements(newIdent.namespace),
      "RENAME cannot move a table across databases")
    Catalog.renameTable(root, oldIdent.namespace.head, oldIdent.name, newIdent.name)
  }
}
