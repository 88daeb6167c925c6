package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import graft.sources.{Fasta, Gff3, Obo}

/** Property-based laws (SURVEY.md §5's suggested upgrade over the
  * reference's example-based tests): coordinate round-trips, reverse-
  * complement involution, parser round-trips. Pure-function level —
  * no SparkSession needed, so thousands of cases run in milliseconds.
  */
object GraftProperties extends Properties("graft") {

  val dna: Gen[String] = Gen.stringOf(Gen.oneOf('A', 'C', 'G', 'T'))

  def revComp(s: String): String =
    s.reverse.map { case 'A' => 'T'; case 'T' => 'A'; case 'C' => 'G'; case 'G' => 'C'; case c => c }

  property("reverse complement is an involution") = Prop.forAll(dna) { s =>
    revComp(revComp(s)) == s
  }

  property("1-based -> interbase -> 1-based round-trips") =
    Prop.forAll(Gen.chooseNum(1, Int.MaxValue - 1)) { start =>
      (start - 1) + 1 == start
    }

  property("GFF3 parse keeps interbase length = fmax - fmin = span") =
    Prop.forAll(Gen.chooseNum(1, 1000000), Gen.chooseNum(0, 10000)) { (start, len) =>
      val end = start + len
      val line = s"chr\tsrc\tgene\t$start\t$end\t.\t+\t.\tID=x"
      Gff3.parseLine(line).exists(r => r.fmax - r.fmin == len + 1)
    }

  val attrVal: Gen[String] = Gen.nonEmptyListOf(
    Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.oneOf(';', '=', '%', ','))).map(_.mkString)

  property("GFF3 attribute escaping round-trips through parse") =
    Prop.forAll(attrVal) { v =>
      // the writer's escape set (Gff3Export.esc): % ; = and the
      // value-separator comma
      val escaped = v.replace("%", "%25").replace(";", "%3B")
        .replace("=", "%3D").replace(",", "%2C")
      val line = s"chr\tsrc\tgene\t1\t10\t.\t+\t.\tID=x;Note=$escaped"
      Gff3.parseLine(line).exists(_.attributes("Note") == Seq(v))
    }

  property("FASTA format/parse round-trips any DNA payload") =
    Prop.forAll(dna.suchThat(_.nonEmpty)) { seq =>
      val text = s">s1\n${seq.grouped(60).mkString("\n")}\n"
      Fasta.parseString(text).toSeq match {
        case Seq(r) => r.seqId == "s1" && r.residues == seq
        case _ => false
      }
    }

  val oboId: Gen[String] = for {
    p <- Gen.nonEmptyListOf(Gen.alphaUpperChar).map(_.mkString)
    n <- Gen.chooseNum(1, 9999999)
  } yield s"$p:$n"

  property("OBO term parse recovers ids and obsolete flags") =
    Prop.forAll(Gen.nonEmptyListOf(oboId).map(_.distinct), Gen.prob(0.3)) { (ids, obs) =>
      val stanzas = ids.map { id =>
        s"[Term]\nid: $id\nname: n-$id" + (if (obs) "\nis_obsolete: true" else "")
      }.mkString("\n\n")
      val terms = Obo.parseTerms("format-version: 1.2\n\n" + stanzas)
      terms.map(_.id) == ids && terms.forall(_.isObsolete == obs)
    }

  property("pipe split/join round-trips pipe-free tokens") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.identifier)) { parts =>
      parts.mkString("|").split("\\|").toSeq == parts
    }
}

/** Unicode normalization laws over the codegen'd expression's kernel
  * (functions/UnicodeNormalize): normalization is a projection —
  * idempotent per form — NFKC output is already NFC-composed, and
  * ASCII is a fixed point of every form (the fast-path contract). */
object UnicodeNormalizeProperties extends Properties("unicode-normalize") {
  import org.apache.spark.unsafe.types.UTF8String

  private def norm(s: String, form: String): String =
    UnicodeNormalize.normalize(UTF8String.fromString(s), form).toString

  val mixed: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('é', '́', 'ﬁ', 'Ｈ', '²'),
    1 -> Gen.oneOf(' ', '.', 'ß'))).map(_.mkString)

  property("each form is idempotent") = Prop.forAll(mixed) { s =>
    Seq("NFC", "NFKC", "NFD", "NFKD").forall(f => norm(norm(s, f), f) == norm(s, f))
  }

  property("NFKC output is NFC-fixed") = Prop.forAll(mixed) { s =>
    norm(norm(s, "NFKC"), "NFC") == norm(s, "NFKC")
  }

  property("ASCII strings are fixed points of every form") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      Seq("NFC", "NFKC", "NFD", "NFKD").forall(f => norm(s, f) == s)
    }
}
