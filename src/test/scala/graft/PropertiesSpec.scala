package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.ext.ByteBpe
import graft.functions.{ArgMaxDouble, CentroidScores, SimHash64, VecDot}
import graft.sources.Connectors

/** ScalaCheck properties over the engine's pure kernels (the parts
  * generated code calls) — no SparkSession needed, hundreds of cases
  * per property.
  */
object PropertiesSpec extends Properties("graft.kernels") {

  private def arr(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any])

  private val tokenGen: Gen[List[String]] =
    Gen.listOf(Gen.identifier.suchThat(_.nonEmpty))

  // byte-BPE's no-UNK guarantee rests on hexSyms being a TOTAL
  // decomposition of any string's UTF-8 bytes (every pre-token has a
  // base-symbol encoding, so no input can ever need an unknown token)
  // — checked over arbitrary unicode strings, surrogates included
  property("byte-bpe: hexSyms totally decomposes any UTF-8 string") =
    forAll { (s: String) =>
      val syms = ByteBpe.hexSyms(s)
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      syms.length == bytes.length &&
        syms.forall(h => h.length == 2 &&
          h.forall("0123456789ABCDEF".contains(_))) &&
        syms.map(h => Integer.parseInt(h, 16).toByte).sameElements(bytes)
    }

  property("byte-bpe: symbolIds gives byte values to bases, 255+r to minted") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(0, 255), Gen.chooseNum(0, 255)))) {
      pairs =>
        val merges = pairs.zipWithIndex.map { case ((a, b), i) =>
          (i + 1, f"$a%02X", f"$b%02X", 1L)
        }
        val id = ByteBpe.symbolIds(merges)
        (0 to 255).forall(b => id(f"$b%02X") == b.toLong) &&
          merges.forall { case (r, p, q, _) => id(p + q) >= 256L }
    }

  property("simhash permutation-invariant (multiset semantics)") =
    forAll(tokenGen) { tokens =>
      val shuffled = new scala.util.Random(42).shuffle(tokens)
      SimHash64.compute(arr(tokens)) == SimHash64.compute(arr(shuffled))
    }

  property("simhash: one-token mutation moves few bits") =
    forAll(tokenGen.suchThat(_.size >= 20)) { tokens =>
      val mutated = tokens.updated(tokens.size / 2, "xXmutationXx")
      val h = java.lang.Long.bitCount(
        SimHash64.compute(arr(tokens)) ^ SimHash64.compute(arr(mutated)))
      (h <= 32) :| s"one-token change moved $h/64 bits"
    }

  property("vec_dot equals the naive fold bit-exactly") = {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    forAll(vecGen, vecGen) { (a, b) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      VecDot.dot(new GenericArrayData(a.toArray[Any]),
        new GenericArrayData(b.toArray[Any])) == expected
    }
  }

  property("arg_max_double picks the first maximum") = {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e3, 1e3))
    forAll(vecGen) { xs =>
      val idx = ArgMaxDouble.argMax(new GenericArrayData(xs.toArray[Any]))
      idx == xs.indexOf(xs.max)
    }
  }

  property("arg_max_double: NaN never wins over a real value") = {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e3, 1e3))
    forAll(vecGen) { xs =>
      val poisoned = Double.NaN :: xs
      val idx = ArgMaxDouble.argMax(new GenericArrayData(poisoned.toArray[Any]))
      idx == poisoned.indexOf(xs.max)
    }
  }

  property("centroid_scores equals per-centroid vec_dot bit-exactly") = {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1e3, 1e3))
    forAll(vecGen, Gen.listOfN(5, vecGen)) { (u, cents) =>
      val ua = new GenericArrayData(u.toArray[Any])
      val out = CentroidScores.scores(ua,
        new GenericArrayData(cents.map(c =>
          new GenericArrayData(c.toArray[Any])).toArray[Any]))
      cents.indices.forall { j =>
        out.getDouble(j) == VecDot.dot(ua,
          new GenericArrayData(cents(j).toArray[Any]))
      }
    }
  }

  property("order_id affine map is injective on distinct indices") = {
    val M = 900000000000000L
    val A = 1000000007L
    def oid(i: Long) = java.lang.Math.floorMod(i * A + 42L, M)
    forAll(Gen.chooseNum(0L, 10000000L), Gen.chooseNum(0L, 10000000L)) { (i, j) =>
      (i == j) || oid(i) != oid(j)
    }
  }

  property("mysql upsert SQL covers all non-key columns, never keys") =
    forAll(Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)) { cols =>
      (cols.nonEmpty) ==> {
        val keys = cols.take(1)
        val sql = Connectors.mysqlUpsertSql("t", cols, keys)
        sql.startsWith("INSERT INTO t (") &&
          cols.forall(sql.contains) &&
          keys.forall(k => !sql.contains(s"$k = VALUES($k)")) &&
          cols.filterNot(keys.contains).forall(c => sql.contains(s"$c = VALUES($c)"))
      }
    }
}
