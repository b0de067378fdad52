package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Delta-binding manifests (r19 — VERDICT r18 item 1): the algebra that
  * lets the q200/q201/q207 manifest bind a plane to an ORDERED CHAIN of
  * generation directories instead of one, so the most frequent
  * multi-plane write — shard admission — commits SHARD-SIZED delta
  * generations and a takedown commits NOTICE-SIZED tombstones, while
  * readers late-union the chain (the
  * [[graft.streaming.PostingsMaintenance]] read discipline lifted into
  * the manifest). The corpus-sized rewrite q207/q201 paid per commit
  * (VERDICT r18 "What's wrong": 10.2→23.5 s and 549 MB superseded
  * bytes per admission at 100×) moves to an explicit COMPACTION
  * transaction on cadence ([[LlmPipeline.compactManifest]]).
  *
  * Binding grammar (one manifest line per plane, [[SqlGateway]]'s
  * `key=value` format): `value` is an ordered `;`-joined element list,
  * each element `<kind>:<path>`:
  *
  *   - `u:` — union rows (admission deltas on the row-union planes:
  *     postings/positions/docstats/shingles/bands/ann_keys/ann_vecs/
  *     pq_cells/pq_codes/pairs — the q188 law: a row is a pure
  *     function of its own doc, doc sets disjoint, so late union ==
  *     one-shot rebuild);
  *   - `t:` — tombstone keys (takedown: the notice's doc/vec ids;
  *     read-side broadcast anti-join — the streamed-plane tombstone
  *     discipline);
  *   - `a:` — additive rows (the one-row stats plane: admission
  *     appends the shard's (nd, ndl, toktot), takedown appends the
  *     NEGATED presence-keyed removal counts; read = column sums);
  *   - `m:` — mergeable head-index rows (token-keyed: df adds, heads
  *     merge as the capped min-k of the union — each side keeps its
  *     cap smallest, so the merge is lossless and associative, the
  *     q168 head-merge argument);
  *   - `o:` — keyed override + retract (labels by id, reps by label,
  *     index takedown by token — planes where a commit MOVES existing
  *     rows: later elements win per key; rows flagged `retract` delete
  *     the key).
  *
  * A BARE path (no kind prefix) parses as a one-element chain of the
  * plane's base kind — every pre-r19 manifest (q200/q201/q207/q208 and
  * the OccSpec races) remains readable unchanged, and a compaction's
  * output binding is again a bare path.
  *
  * Sequencing matters and is preserved: the fold applies elements
  * left-to-right, so `…;t:notice;u:shard` serves a doc the notice
  * named but the later admission re-added (takedown-then-admit), while
  * `…;u:shard;t:notice` does not (admit-then-takedown) — exactly the
  * non-commuting pair OccSpec's q207 race enumerates.
  *
  * Scale shape: resolution is declarative — unions concatenate file
  * scans (no shuffle), tombstones are notice-sized broadcast
  * anti-joins, the `m` fold is one vocabulary-sized groupBy, and the
  * `o` folds anti-join delta-sized key sets against the base scan.
  * Chains stay short because compaction folds them on cadence. The
  * one chain-length cost beyond plan width: a multi-element `bands`
  * chain re-applies its per-bucket cap as a (band, bsig) window — a
  * well-distributed shuffle key, paid only between compactions and
  * folded away by them (single-element chains skip it entirely).
  */
private[graft] object PlaneChains {

  sealed trait Kind { def tag: String }
  case object U extends Kind { val tag = "u" } // union rows
  case object T extends Kind { val tag = "t" } // tombstone keys
  case object A extends Kind { val tag = "a" } // additive stats rows
  case object M extends Kind { val tag = "m" } // mergeable index rows
  case object O extends Kind { val tag = "o" } // keyed override + retract

  final case class Elem(kind: Kind, path: String)

  /** The base element kind a bare-path (v1) binding denotes. */
  def baseKind(plane: String): Kind = plane match {
    case "stats"           => A
    case "index"           => M
    case "labels" | "reps" => O
    case _                 => U
  }

  /** Key columns the `t`/`o` folds join on. The `pairs` tombstone is
    * special-cased in the fold (anti on EITHER endpoint of a
    * single-column id set).
    */
  def keyCols(plane: String): Seq[String] = plane match {
    case "ann_keys" | "ann_vecs" | "pq_cells" | "pq_codes" => Seq("vec_id")
    case "pairs"  => Seq("id")
    case "labels" => Seq("id")
    case "reps"   => Seq("label")
    case "index"  => Seq("token")
    case "stats"  => Seq.empty
    case _        => Seq("doc_id")
  }

  def encode(chain: Seq[Elem]): String =
    chain.map(e => s"${e.kind.tag}:${e.path}").mkString(";")

  /** Parse a binding value; a bare path is a one-element base chain.
    * An element that LOOKS like a kind prefix (`<letter>:`) but names
    * no known kind is rejected here with the offending element named —
    * never silently treated as a bare path that would only fail later
    * as an opaque parquet path-not-found three layers down a plane
    * read (ADVICE r19).
    */
  def parse(plane: String, value: String): Seq[Elem] =
    value.split(";").iterator.filter(_.nonEmpty).map { el =>
      el.splitAt(2) match {
        case ("u:", p) => Elem(U, p)
        case ("t:", p) => Elem(T, p)
        case ("a:", p) => Elem(A, p)
        case ("m:", p) => Elem(M, p)
        case ("o:", p) => Elem(O, p)
        case (k, _) if k.length == 2 && k(1) == ':' && k(0).isLetter &&
            k(0).isLower =>
          throw new IllegalArgumentException(
            s"unknown chain-element kind '$k' in plane $plane element '$el'")
        case _ => Elem(baseKind(plane), el)
      }
    }.toSeq

  /** Every directory path a binding value names — the vacuum's
    * retained-set unit ([[SqlGateway.vacuumManifestLog]] must retain
    * EVERY generation a retained manifest's chains bind, deltas and
    * tombstones included, or a vacuum under an uncompacted chain would
    * delete live delta generations).
    */
  def paths(value: String): Seq[String] =
    value.split(";").iterator.filter(_.nonEmpty).map { el =>
      el.splitAt(2) match {
        case (k, p) if Set("u:", "t:", "a:", "m:", "o:").contains(k) => p
        case (k, _) if k.length == 2 && k(1) == ':' && k(0).isLetter &&
            k(0).isLower =>
          // Same strictness as [[parse]]: a vacuum that silently read a
          // typo'd kind as a bare path would compute the wrong retained
          // set.
          throw new IllegalArgumentException(
            s"unknown chain-element kind '$k' in element '$el'")
        case _ => el
      }
    }.toSeq

  /** Append one element to an existing binding value. */
  def append(value: String, elem: Elem): String =
    s"$value;${elem.kind.tag}:${elem.path}"

  /** Resolve a plane's chain to the maintained relation — the one read
    * path every manifest consumer shares (BM25 reads, the consistency
    * audit, compaction, the OccSpec laws). Single-element base chains
    * reduce to a plain parquet scan, so v1 manifests read unchanged.
    */
  def resolve(spark: SparkSession, plane: String, value: String): DataFrame = {
    val chain = parse(plane, value)
    require(chain.nonEmpty, s"empty chain for plane $plane")
    plane match {
      case "stats" => resolveStats(spark, chain)
      case "index" => resolveIndex(spark, chain)
      case "labels" | "reps" => resolveOverride(spark, plane, chain)
      case _ => resolveUnion(spark, plane, chain)
    }
  }

  /** Union/tombstone fold for the row-union planes. The `bands` plane
    * additionally re-applies its per-bucket cap ONCE at the end of a
    * multi-element chain: the stored base kept its cap smallest per
    * bucket, so cap(survivors of the sequential fold) equals the
    * incremental touched-bucket re-cap on the add side; on the delete
    * axis the end-cap can only refill from rows the chain still holds,
    * which is the rewrite convention's documented subset asymmetry or
    * better — never above cap, never a removed doc.
    */
  private def resolveUnion(
      spark: SparkSession, plane: String, chain: Seq[Elem]): DataFrame = {
    val head = spark.read.parquet(chain.head.path)
    require(chain.head.kind == U, s"$plane chain must start with a base element")
    val cols = head.columns.map(col).toSeq
    var cur = head
    chain.tail.foreach { e =>
      e.kind match {
        case U => cur = cur.unionByName(spark.read.parquet(e.path))
        case T =>
          val tomb = spark.read.parquet(e.path)
          cur =
            if (plane == "pairs")
              cur.join(broadcast(tomb.select(col("id").as("id1"))),
                  Seq("id1"), "left_anti")
                .join(broadcast(tomb.select(col("id").as("id2"))),
                  Seq("id2"), "left_anti")
                .select(cols: _*)
            else
              cur.join(broadcast(tomb.select(keyCols(plane).map(col): _*)),
                  keyCols(plane), "left_anti")
                .select(cols: _*)
        case k => throw new IllegalArgumentException(
          s"element kind ${k.tag} invalid on union plane $plane")
      }
    }
    if (plane == "bands" && chain.size > 1)
      cur.withColumn("brk", row_number().over(
          Window.partitionBy("band", "bsig").orderBy("doc_id")))
        .filter(col("brk") <= LlmPipeline.LshBucketCap)
        .select(cols: _*)
    else cur
  }

  /** The one-row stats plane: every element contributes rows (the base
    * row, shard additions, negated presence-keyed removals) and the
    * resolved relation is their column-wise sum.
    */
  private def resolveStats(spark: SparkSession, chain: Seq[Elem]): DataFrame = {
    chain.foreach(e => require(e.kind == A,
      s"element kind ${e.kind.tag} invalid on the stats plane"))
    chain.map(e => spark.read.parquet(e.path))
      .reduce(_ unionByName _)
      .agg(coalesce(sum("nd"), lit(0L)).as("nd"),
        coalesce(sum("ndl"), lit(0L)).as("ndl"),
        coalesce(sum("toktot"), lit(0L)).as("toktot"))
  }

  /** Head-index fold: runs of `m` elements merge by ONE groupBy (df
    * sums; heads are the capped min-k of the sorted union — lossless
    * because each side holds its own cap smallest), and an `o` element
    * (a takedown's affected-token override) anti-joins its keys then
    * adds its non-retract rows.
    */
  private def resolveIndex(spark: SparkSession, chain: Seq[Elem]): DataFrame = {
    def mergeM(parts: Seq[DataFrame]): DataFrame =
      if (parts.size == 1) parts.head
      else parts.reduce(_ unionByName _)
        .groupBy("token")
        .agg(sum("df").as("df"),
          slice(array_sort(flatten(collect_list("head_ids"))), 1,
            LlmPipeline.PostingsHeadCap).as("head_ids"))
    require(chain.head.kind == M, "index chain must start with a base element")
    var pending = List(spark.read.parquet(chain.head.path))
    var cur: DataFrame = null
    def flush(): DataFrame = { cur = mergeM(pending); pending = List(cur); cur }
    chain.tail.foreach { e =>
      e.kind match {
        case M => pending = pending :+ spark.read.parquet(e.path)
        case O =>
          val o = spark.read.parquet(e.path)
          val merged = flush()
          cur = merged
            .join(broadcast(o.select("token")), Seq("token"), "left_anti")
            .unionByName(o.filter(!col("retract"))
              .select("token", "df", "head_ids"))
          pending = List(cur)
        case k => throw new IllegalArgumentException(
          s"element kind ${k.tag} invalid on the index plane")
      }
    }
    flush()
  }

  /** Keyed override + retract fold (labels by id, reps by label): each
    * later element wins per key; `retract` rows delete the key. The
    * overlay law is CcStreamSpec's (`mergeComponentDeltas` overlay ==
    * `mergeComponentLabels`), lifted to the manifest chain.
    */
  private def resolveOverride(
      spark: SparkSession, plane: String, chain: Seq[Elem]): DataFrame = {
    chain.foreach(e => require(e.kind == O,
      s"element kind ${e.kind.tag} invalid on override plane $plane"))
    val keys = keyCols(plane)
    val base0 = spark.read.parquet(chain.head.path)
    val cols = base0.columns.filterNot(_ == "retract").map(col).toSeq
    var cur =
      if (base0.columns.contains("retract"))
        base0.filter(!col("retract")).select(cols: _*)
      else base0
    chain.tail.foreach { e =>
      val o = spark.read.parquet(e.path)
      cur = cur
        .join(broadcast(o.select(keys.map(col): _*).distinct()), keys, "left_anti")
        .unionByName(o.filter(!col("retract")).select(cols: _*))
    }
    cur
  }

  /** Recursive byte size of a directory tree — the staged-bytes
    * measurement q210/q212 gate on (delta commits must stage
    * shard-/notice-sized bytes, not corpus-sized rewrites).
    */
  def dirBytes(p: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(p)) 0L
    else scala.util.Using.resource(java.nio.file.Files.walk(p)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
    }
  }
}
