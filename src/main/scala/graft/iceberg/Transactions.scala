package graft.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path

import scala.collection.mutable.ArrayBuffer

/** A catalog that can commit several tables' changes in ONE atomic unit —
  * the Iceberg REST spec's `POST /v1/{prefix}/transactions/commit`
  * (`CommitTransactionRequest`). The service owns every table pointer, so
  * it can arbitrate the whole set at once; this is the true-atomicity
  * path. The reference's REST crate has no write path at all
  * (`catalog.rs:83-135` reads only), let alone transactions. */
trait TransactionalCatalog {
  /** Each change: (namespace, table name, requirements, updates). Either
    * every change applies or none does; a requirement failure anywhere
    * surfaces as [[CommitConflictException]]. */
  def commitTransaction(
      changes: Seq[(Seq[String], String, Seq[JsonNode], Seq[JsonNode])]): Unit
}

/** A committer whose pointer lives in a [[TransactionalCatalog]] — lets
  * [[Transactions.commitAll]] route a multi-table commit as one service
  * call when every table shares the catalog. */
trait CatalogBackedCommitter extends TableCommitter {
  def txCatalog: TransactionalCatalog
  def txNamespace: Seq[String]
  def txName: String
}

/** Multi-table transactions over the same (requirements, updates) pairs
  * single-table commits use.
  *
  * The data plane needs no coordination: every writer already writes its
  * parquet/manifests BEFORE the pointer moves, and a failed commit
  * strands orphan files, never a broken table. So a transaction is
  * "write all tables' files, then move ALL pointers or NONE", and the
  * only machinery needed is capturing each writer's would-be commit
  * instead of publishing it — [[StagingCommitter]] — plus an
  * all-or-nothing publish — [[commitAll]].
  */
object Transactions {

  /** One table's captured commit: the committer that will publish it and
    * the (requirements, updates) pair it would have sent. */
  final case class TableChange(committer: TableCommitter,
                               requirements: Seq[JsonNode],
                               updates: Seq[JsonNode])

  /** Capture seam: hand this to any [[IcebergWriter]] entry point in
    * place of the real committer and the write does everything EXCEPT
    * move the pointer — data files land on disk, the (requirements,
    * updates) pair lands here. One commit per staging committer: a
    * writer that commits twice (e.g. compact) cannot be staged, because
    * its second commit reads state the first never published. */
  final class StagingCommitter(val inner: TableCommitter)
      extends TableCommitter {
    private var staged: Option[(Seq[JsonNode], Seq[JsonNode])] = None
    override def tableDir: String = inner.tableDir
    override def conf: org.apache.hadoop.conf.Configuration = inner.conf
    override def currentRoot(mapper: ObjectMapper): ObjectNode =
      inner.currentRoot(mapper)
    override def currentMetadata(): TableMetadata = inner.currentMetadata()
    override def commit(requirements: Seq[JsonNode],
                        updates: Seq[JsonNode]): Unit = {
      require(staged.isEmpty,
        s"StagingCommitter for $tableDir captured a second commit — " +
          "multi-commit writes cannot be staged in a transaction")
      staged = Some((requirements, updates))
    }
    def change: TableChange = staged match {
      case Some((r, u)) => TableChange(inner, r, u)
      case None => throw new IllegalStateException(
        s"StagingCommitter for $tableDir captured no commit")
    }
  }

  /** Stage one write: runs `write` against a capturing committer and
    * returns the captured change. `write(c)` must pass `c` as the
    * operation's committer. */
  def stage(inner: TableCommitter)(write: TableCommitter => Unit): TableChange = {
    val s = new StagingCommitter(inner)
    write(s)
    s.change
  }

  /** Publish every change or none.
    *
    *  - All changes on ONE [[TransactionalCatalog]] → a single
    *    `CommitTransactionRequest`; the service is the atomicity point.
    *  - All changes on [[FsCommitter]]s → validate every table's
    *    requirements against fresh metadata FIRST (a requirement failure
    *    anywhere publishes nothing), then publish each with create-new.
    *    A rival commit landing inside the publish window loses the
    *    create-new race for its table; already-published tables are then
    *    compensated — their pre-transaction state is re-published as a
    *    fresh version, guarded by an is-ours check so a commit that
    *    already built on top is never clobbered. A process crash inside
    *    the window can still leave the transaction partially applied
    *    (each table individually consistent); a catalog service is the
    *    path with no such window.
    *
    * Throws [[CommitConflictException]] on any conflict; the message
    * names tables that could not be rolled back (none, absent crashes).
    */
  def commitAll(changes: Seq[TableChange]): Unit = {
    require(changes.nonEmpty, "commitAll: no changes")
    require(changes.map(_.committer.tableDir).distinct.size == changes.size,
      "commitAll: one change per table — merge a table's writes before staging")
    val catalogBacked = changes.map(_.committer).collect {
      case c: CatalogBackedCommitter => c
    }
    if (catalogBacked.size == changes.size &&
        catalogBacked.map(_.txCatalog).distinct.size == 1) {
      catalogBacked.head.txCatalog.commitTransaction(
        changes.zip(catalogBacked).map { case (ch, c) =>
          (c.txNamespace, c.txName, ch.requirements, ch.updates)
        })
      return
    }
    val fs = changes.map(_.committer).collect { case c: FsCommitter => c }
    require(fs.size == changes.size,
      "commitAll: changes mix committer kinds (or use a committer with no " +
        "transaction support) — a transaction needs one filesystem " +
        "warehouse or one catalog service owning every pointer")

    val mapper = new ObjectMapper()
    // phase 1 — validate ALL requirements against fresh roots; any
    // failure throws before anything is published
    val staged: Seq[(FsCommitter, ObjectNode, Path, ObjectNode)] =
      changes.zip(fs).map { case (ch, c) =>
        val (root, latest) = c.rootAndPath(mapper)
        MetadataCommit.checkRequirements(root, ch.requirements).foreach(err =>
          throw new CommitConflictException(
            s"transaction rejected at ${c.tableDir}: $err — no table " +
              "was committed"))
        val next = MetadataCommit.applyUpdates(
          mapper, root.deepCopy[ObjectNode](), ch.updates)
        (c, root, latest, next)
      }
    // phase 2 — publish in order; a lost create-new race triggers
    // compensation of everything already published
    val published = ArrayBuffer[(FsCommitter, ObjectNode, Path)]()
    try {
      staged.foreach { case (c, root, latest, next) =>
        val createdAt = c.publishAfter(mapper, latest, next)
        published += ((c, root, createdAt))
      }
    } catch {
      case e: CommitConflictException =>
        val stuck = published.flatMap { case (c, prevRoot, ours) =>
          try {
            // only restore if OUR version is still the head — a commit
            // already built on top must not be clobbered. Compare by file
            // NAME: latestPath() comes back scheme-qualified
            // (file:/...), publishAfter built a schemeless Path, and the
            // version number alone identifies the head within one table
            if (c.latestPath().getName == ours.getName) {
              c.publishAfter(mapper, ours, prevRoot); None
            } else Some(s"${c.tableDir} (a later commit built on the " +
              "transaction's version)")
          } catch {
            case e2: Exception =>
              Some(s"${c.tableDir} (rollback failed: ${e2.getMessage})")
          }
        }
        val detail =
          if (stuck.isEmpty)
            s"all ${published.size} already-published table(s) rolled back"
          else s"COULD NOT ROLL BACK: ${stuck.mkString("; ")}"
        throw new CommitConflictException(
          s"transaction lost a commit race mid-publish (${e.getMessage}); " +
            detail)
    }
  }
}
