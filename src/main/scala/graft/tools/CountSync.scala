package graft.tools

import java.nio.file.{Files, Paths}

/** Single source of truth for the documented registry count.
  *
  * Every "N operators"-style claim in the docs is generated from
  * [[graft.queries.Registry.all.size]] via the templates below; the
  * drift guard (`EntrySmokeSpec`) checks the exact same templates and
  * its failure message names this main. Adding a registry entry with
  * no doc edit therefore fails exactly one test, and the fix is one
  * command: `sbt "runMain graft.tools.CountSync"`.
  */
object CountSync {

  /** (file, template) pairs; `@N@` is replaced by the registry size.
    * The regex form matches any stale count so sync is idempotent.
    */
  val sites: Seq[(String, String)] = Seq(
    "README.md" -> "the verifiable registry: @N@ operators",
    "README.md" -> "(@N@/@N@ hash-checked)",
    "README.md" -> "plans all @N@ registry",
    "COVERAGE.md" -> "plans all @N@ queries"
  )

  def expected(n: Int): Seq[(String, String)] =
    sites.map { case (f, t) => (f, t.replace("@N@", n.toString)) }

  private def asRegex(t: String): String =
    java.util.regex.Pattern.quote(t).replace("@N@", "\\E\\d+\\Q")

  def main(args: Array[String]): Unit = {
    val n = graft.queries.Registry.all.size
    val missed = scala.collection.mutable.ArrayBuffer[(String, String)]()
    sites.groupBy(_._1).foreach { case (file, pairs) =>
      val p = Paths.get(file)
      var s = Files.readString(p)
      pairs.foreach { case (_, t) =>
        val re = asRegex(t).r
        if (re.findFirstIn(s).isEmpty) missed += ((file, t))
        else s = s.replaceAll(re.regex, t.replace("@N@", n.toString))
      }
      Files.writeString(p, s)
    }
    // a template that matches NOTHING means the doc wording drifted —
    // printing success would leave the drift spec failing with a
    // remedy that no-ops; fail loudly naming the site instead
    if (missed.nonEmpty) {
      System.err.println("CountSync: these templates matched nothing " +
        "(doc wording drifted — fix the doc or the template):\n" +
        missed.map { case (f, t) => s"  $f: \"$t\"" }.mkString("\n"))
      sys.exit(1)
    }
    println(s"CountSync: documented counts set to $n in " +
      sites.map(_._1).distinct.mkString(", "))
  }
}
