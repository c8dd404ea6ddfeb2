package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.iceberg.{ColStats, Pruning, SingleValue}

/** Pruning soundness property (SURVEY §5.2.4): for random container
  * contents and random predicates, a container holding ANY matching row
  * must never be pruned. Completeness (pruning non-matching containers) is
  * an optimization checked by the pinned fixture tests in IcebergSpec;
  * soundness is the invariant that may never break (§7.4: decode doubt ⇒
  * keep).
  */
class PruningSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(r.passed, r.status.toString)
  }

  private def statsOf(rows: Seq[Option[Long]]): ColStats = {
    val vs = rows.flatten
    ColStats(
      lower = vs.minOption,
      upper = vs.maxOption,
      nullCount = Some(rows.count(_.isEmpty).toLong),
      valueCount = Some(rows.size.toLong))
  }

  private def eval(f: Filter, row: Option[Long]): Boolean = f match {
    case EqualTo(_, v)             => row.contains(v.asInstanceOf[Long])
    case GreaterThan(_, v)         => row.exists(_ > v.asInstanceOf[Long])
    case GreaterThanOrEqual(_, v)  => row.exists(_ >= v.asInstanceOf[Long])
    case LessThan(_, v)            => row.exists(_ < v.asInstanceOf[Long])
    case LessThanOrEqual(_, v)     => row.exists(_ <= v.asInstanceOf[Long])
    case In(_, vs)                 => row.exists(r => vs.exists(_ == r))
    case IsNull(_)                 => row.isEmpty
    case IsNotNull(_)              => row.isDefined
    case And(l, r)                 => eval(l, row) && eval(r, row)
    case Or(l, r)                  => eval(l, row) || eval(r, row)
    case Not(c)                    => !eval(c, row)
    case _                         => true
  }

  private val genValue: Gen[Long] = Gen.chooseNum(-5L, 5L)
  private val genRow: Gen[Option[Long]] =
    Gen.frequency(5 -> genValue.map(Some(_)), 1 -> Gen.const(None))

  private val genLeaf: Gen[Filter] = Gen.oneOf(
    genValue.map(EqualTo("c", _)),
    genValue.map(GreaterThan("c", _)),
    genValue.map(GreaterThanOrEqual("c", _)),
    genValue.map(LessThan("c", _)),
    genValue.map(LessThanOrEqual("c", _)),
    Gen.listOfN(3, genValue).map(vs => In("c", vs.toArray.map(_.asInstanceOf[Any]))),
    Gen.const(IsNull("c")),
    Gen.const(IsNotNull("c")))

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      1 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1)) yield And(l, r)),
      1 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1)) yield Or(l, r)),
      1 -> genLeaf.map(Not(_)))

  test("a container with any matching row is never pruned") {
    check(Prop.forAll(Gen.nonEmptyListOf(genRow), genFilter(2)) { (rows, f) =>
      val stats = statsOf(rows)
      val anyMatch = rows.exists(eval(f, _))
      // soundness: anyMatch ⇒ mayMatch (keep); the converse may be false
      !anyMatch || Pruning.mayMatch(f, _ => Some(stats))
    })
  }

  test("missing stats always keep the container") {
    check(Prop.forAll(genFilter(2)) { f =>
      Pruning.mayMatch(f, _ => None) &&
        Pruning.mayMatch(f, _ => Some(ColStats(None, None, None, None)))
    })
  }

  test("single-value decode: little-endian fixed-width layouts") {
    def le(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN); fill(b); b.array
    }
    assert(SingleValue.decode(le(4)(_.putInt(42)), IntegerType).contains(42))
    assert(SingleValue.decode(le(8)(_.putLong(-7L)), LongType).contains(-7L))
    assert(SingleValue.decode(le(4)(_.putFloat(1.8f)), FloatType).contains(1.8f))
    assert(SingleValue.decode(le(8)(_.putDouble(15.32)), DoubleType).contains(15.32))
    assert(SingleValue.decode(Array[Byte](1), BooleanType).contains(true))
    assert(SingleValue.decode("hé".getBytes("UTF-8"), StringType).contains("hé"))
    assert(SingleValue.decode(le(4)(_.putInt(19000)), DateType).contains(19000))
    // decimal: unscaled big-endian two's-complement
    assert(SingleValue.decode(BigInt(12345).toByteArray, DecimalType(9, 2))
      .contains(BigDecimal(123.45)))
    // truncated buffer ⇒ None, never a wrong value
    assert(SingleValue.decode(Array[Byte](1, 2), LongType).isEmpty)
  }

  test("NaN bounds never prune (float safety)") {
    val nanStats = ColStats(Some(Float.NaN), Some(Float.NaN), Some(0L), Some(10L))
    assert(Pruning.mayMatch(GreaterThan("c", 5.0f), _ => Some(nanStats)))
    assert(Pruning.mayMatch(EqualTo("c", 1.0f), _ => Some(nanStats)))
  }
}
