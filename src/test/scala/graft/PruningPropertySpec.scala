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

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
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
}
