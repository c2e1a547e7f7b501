package graft

import org.scalatest.funsuite.AnyFunSuite

class ScratchBrotli3Spec extends AnyFunSuite {
  test("validate transforms against encoder vectors") {
    val entry = """"([^"]+)":\s*\{"plain":\s*"([^"]*)",\s*"br":\s*"([^"]*)"\}""".r
    val b64 = java.util.Base64.getDecoder
    for (f <- Seq("/tmp/brotli_vectors.json", "/tmp/brotli_vectors2.json")) {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), "UTF-8")
      var ok, unsup, wrong = 0
      val names = scala.collection.mutable.ListBuffer.empty[String]
      val wrongN = scala.collection.mutable.ListBuffer.empty[String]
      for (m <- entry.findAllMatchIn(txt)) {
        val (name, plain, br) = (m.group(1), b64.decode(m.group(2)), b64.decode(m.group(3)))
        graft.sources.Brotli.decodeEither(br) match {
          case Right(got) if java.util.Arrays.equals(got, plain) => ok += 1
          case Right(_) => wrong += 1; wrongN += name
          case Left(r) => unsup += 1; names += s"$name:$r"
        }
      }
      println(s"[brotli3] $f ok=$ok none=$unsup WRONG=$wrong")
      if (names.nonEmpty) println(s"[brotli3] none: ${names.take(30).mkString(", ")}")
      if (wrongN.nonEmpty) println(s"[brotli3] WRONG: ${wrongN.take(30).mkString(", ")}")
      assert(wrong === 0)
    }
  }
}
