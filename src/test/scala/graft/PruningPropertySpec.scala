package graft

import graft.cdc.CdcCodec
import graft.sources.EnvelopePredicate
import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Soundness property for whole-file pruning: if `mightMatchFile`
  * rejects a file, then NO (op, gtid, tm) the file can contain satisfies
  * the row predicate. (Unsound pruning = silent data loss — the one bug
  * class this feature must never have.) */
class PruningPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, minTests: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private val genLit: Gen[Long] = Gen.chooseNum(-50L, 150L)

  private def genLeaf: Gen[Filter] = for {
    colName <- Gen.oneOf("__gtid", "__op")
    v <- genLit
    f <- Gen.oneOf[Filter](
      EqualTo(colName, v), GreaterThan(colName, v), GreaterThanOrEqual(colName, v),
      LessThan(colName, v), LessThanOrEqual(colName, v),
      In(colName, Array[Any](v, v + 3, v - 7)))
  } yield f

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> (for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield And(l, r)),
      1 -> (for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield Or(l, r)),
      1 -> genFilter(depth - 1).map(Not(_): Filter))

  test("property: pruned files can contain no matching row") {
    val genCase = for {
      lo <- Gen.chooseNum(0L, 100L)
      span <- Gen.chooseNum(0L, 40L)
      filters <- Gen.listOfN(2, genFilter(2))
      // sample points inside the file's gtid box, any op
      gtids <- Gen.listOfN(20, Gen.chooseNum(lo, lo + span))
      ops <- Gen.listOfN(20, Gen.chooseNum(0, 3))
    } yield (lo, span, filters.toArray, gtids, ops)

    check(Prop.forAll(genCase) { case (lo, span, filters, gtids, ops) =>
      val meta = CdcCodec.FileMeta(lo, lo + span, 0L, 1000L)
      val might = EnvelopePredicate.mightMatchFile(filters, Some(meta))
      if (might) true // keeping a file is always sound
      else {
        val rowPred = EnvelopePredicate.compile(filters)
        // tm fixed mid-box (gtid filters are what we generate)
        gtids.zip(ops).forall { case (g, op) =>
          !rowPred(op, g, 500000L,
            org.apache.spark.unsafe.types.UTF8String.fromString("src"))
        }
      }
    })
  }

  test("property: tagged PREVIOUS_GTIDS bounds cover every file's actual gnos") {
    // derivation soundness for the 8.3+ tagged encoding: random
    // per-stream gno histories split across 3 files, each file opening
    // with the tagged executed-before set — the derived [lo, hi] of
    // every non-tail file must COVER its actual gnos (a bound that
    // excludes a present gno is silent data loss under pruning)
    import graft.cdc.MysqlBinlog
    val uuid = "aaaaaaaa-0000-0000-0000-000000000001"
    val streams = Vector(uuid, s"$uuid:etl", s"$uuid:repair")
    val genCase = for {
      nStreams <- Gen.chooseNum(1, 3)
      perStream <- Gen.listOfN(nStreams,
        Gen.nonEmptyListOf(Gen.chooseNum(1L, 60L)).map(_.distinct.sorted))
      assign <- Gen.listOfN(perStream.map(_.size).sum, Gen.chooseNum(0, 2))
    } yield (perStream, assign)
    def toIntervals(gnos: Seq[Long]): Seq[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      gnos.distinct.sorted.foreach { g =>
        if (out.nonEmpty && out.last._2 == g)
          out(out.length - 1) = (out.last._1, g + 1)
        else out += ((g, g + 1))
      }
      out.toSeq
    }
    check(Prop.forAll(genCase) { case (perStream, assign) =>
      val dir = java.nio.file.Files.createTempDirectory("prune-prop").toString
      try {
        // gno → file assignment, flattened in stream order
        var ai = 0
        val byFile = Array.fill(3)(
          scala.collection.mutable.Map.empty[String, Vector[Long]])
        perStream.zipWithIndex.foreach { case (gnos, si) =>
          val key = streams(si)
          gnos.foreach { g =>
            val f = assign(ai); ai += 1
            byFile(f)(key) = byFile(f).getOrElse(key, Vector.empty) :+ g
          }
        }
        val files = (0 until 3).map(i => s"$dir/b.00000$i")
        var executed = Map.empty[String, Vector[Long]]
        (0 until 3).foreach { i =>
          val w = new MysqlBinlog.Writer(files(i), checksum = true)
          w.previousGtidsTagged(executed.map { case (k, gs) => k -> toIntervals(gs) })
          w.close()
          executed = (executed.keySet ++ byFile(i).keySet).map { k =>
            k -> (executed.getOrElse(k, Vector.empty) ++
              byFile(i).getOrElse(k, Vector.empty))
          }.toMap
        }
        val bounds = MysqlBinlog.fileGtidBounds(files)
        (0 until 2).forall { i =>
          val actual = byFile(i).values.flatten.toSeq
          bounds(i) match {
            case None => true // unprunable is always sound
            case Some((lo, hi)) =>
              actual.forall(g => g >= lo && g <= hi)
          }
        } && bounds(2).isEmpty // the tail has no successor set
      } finally graft.TmpDirs.deleteRecursively(new java.io.File(dir))
    }, minTests = 40)
  }

  test("property: MariaDB GTID_LIST bounds cover every file's actual seqs") {
    // the fork's state lists carry only the per-(domain, server) MAX
    // seq, so executed reduces to [1, max+1) per domain — sound as long
    // as per-domain seqs are monotone in file order, which mariadbd
    // guarantees (one counter per domain). Random monotone histories:
    import graft.cdc.MysqlBinlog
    val genCase = for {
      nDomains <- Gen.chooseNum(1, 3)
      perDomain <- Gen.listOfN(nDomains,
        Gen.nonEmptyListOf(Gen.chooseNum(1L, 60L)).map(_.distinct.sorted))
      cut1 <- Gen.chooseNum(0, 100)
      cut2 <- Gen.chooseNum(0, 100)
    } yield (perDomain, cut1, cut2)
    check(Prop.forAll(genCase) { case (perDomain, c1, c2) =>
      val dir = java.nio.file.Files.createTempDirectory("prune-mprop").toString
      try {
        // per-domain monotone split: first c1% in file 0, next to c2 in
        // file 1, rest in file 2 (order preserved — the fork invariant)
        val cuts = Seq(math.min(c1, c2), math.max(c1, c2))
        val byFile = Array.fill(3)(
          scala.collection.mutable.Map.empty[Long, Vector[Long]])
        perDomain.zipWithIndex.foreach { case (seqs, d) =>
          seqs.zipWithIndex.foreach { case (s, i) =>
            val pct = if (seqs.size == 1) 50 else i * 100 / (seqs.size - 1)
            val f = if (pct < cuts(0)) 0 else if (pct < cuts(1)) 1 else 2
            byFile(f)(d.toLong) = byFile(f).getOrElse(d.toLong, Vector.empty) :+ s
          }
        }
        val files = (0 until 3).map(i => s"$dir/m.00000$i")
        val lastSeq = scala.collection.mutable.Map.empty[Long, Long]
        (0 until 3).foreach { i =>
          val w = new MysqlBinlog.Writer(files(i), checksum = true, maria = true)
          w.gtidList(lastSeq.toSeq.map { case (d, s) => (d, 101L, s) })
          w.close()
          byFile(i).foreach { case (d, ss) =>
            lastSeq(d) = math.max(lastSeq.getOrElse(d, 0L), ss.max)
          }
        }
        val bounds = MysqlBinlog.mariaFileGtidBounds(files)
        (0 until 2).forall { i =>
          val actual = byFile(i).values.flatten.toSeq
          bounds(i) match {
            case None => true
            case Some((lo, hi)) => actual.forall(s => s >= lo && s <= hi)
          }
        } && bounds(2).isEmpty
      } finally graft.TmpDirs.deleteRecursively(new java.io.File(dir))
    }, minTests = 40)
  }
}
