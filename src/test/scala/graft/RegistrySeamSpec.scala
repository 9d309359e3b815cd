package graft

import graft.sources.{RegistryBackend, RegistryData}
import org.scalatest.funsuite.AnyFunSuite

/** The registry-client seam (VERDICT r8 #7): RegistrySource's Scaladoc
  * claims "a real registry service drops in by replacing RegistryData
  * with its client without touching any query". This spec EXERCISES that
  * claim: a second backend — a JSON-served fixture, the reference
  * registry's own wire shape — swaps in via RegistryData.withBackend, and
  * the DSv2 connector AND the whole r01–r14 query pack are shown to track
  * the new rows with zero query changes, then revert when the builtin
  * client is restored.
  */
class RegistrySeamSpec extends AnyFunSuite with SparkTestBase {

  /** A registry CLIENT over the reference's JSON document shape (the
    * HTTP body `GET /filetypes` / `GET /extractors` would return) — what
    * a real deployment implements against its service.
    */
  private class JsonRegistryClient(json: String) extends RegistryBackend {
    private val root = org.json4s.jackson.JsonMethods.parse(json)
      .values.asInstanceOf[Map[String, Any]]
    private def tbl(name: String): Seq[Map[String, Any]] =
      root(name).asInstanceOf[List[Any]].map(_.asInstanceOf[Map[String, Any]])
    override def rows(table: String): Seq[Seq[Any]] = table match {
      case "filetypes" => tbl("filetypes").map(m => Seq(
        m("id").asInstanceOf[String],
        m("registered_extractors").asInstanceOf[List[Any]].map(_.asInstanceOf[String])))
      case "usages" => tbl("usages").map(m => Seq(
        m("extractor_id").asInstanceOf[String],
        m("idx").toString.toInt,
        m("method").asInstanceOf[String],
        m("setup").asInstanceOf[String],
        m("command").asInstanceOf[String]))
      case "installations" => tbl("installations").map(m => Seq(
        m("extractor_id").asInstanceOf[String],
        m("method").asInstanceOf[String],
        m("package").asInstanceOf[String]))
    }
  }

  // a DIFFERENT registry: biologic-mpr's rank order flipped (galvani now
  // chosen), csv gains an extractor it never had, pdf is gone, and a
  // brand-new "newtool" extractor arrives with usages + installation
  private val fixtureJson = """
    {"filetypes": [
       {"id": "biologic-mpr", "registered_extractors": ["galvani", "yadg"]},
       {"id": "example-xy",   "registered_extractors": ["yadg"]},
       {"id": "nexus-hdf5",   "registered_extractors": ["h5grove"]},
       {"id": "csv",          "registered_extractors": ["newtool"]},
       {"id": "tiff",         "registered_extractors": []}],
     "usages": [
       {"extractor_id": "yadg", "idx": 0, "method": "python", "setup": "yadg",
        "command": "yadg.extractors.extract({{ input_type }}, {{ input_path }})"},
       {"extractor_id": "galvani", "idx": 0, "method": "python", "setup": "galvani",
        "command": "galvani.MPRfile({{ input_path }})"},
       {"extractor_id": "h5grove", "idx": 0, "method": "cli", "setup": "",
        "command": "h5dump {{ input_path }} > {{ output_path }}"},
       {"extractor_id": "newtool", "idx": 0, "method": "cli", "setup": "",
        "command": "newtool {{ input_path }} --out {{ output_path }}"},
       {"extractor_id": "newtool", "idx": 1, "method": "python", "setup": "newtool",
        "command": "newtool.load(path={{ input_path }}, fmt='auto')"}],
     "installations": [
       {"extractor_id": "yadg", "method": "pip", "package": "yadg~=5.0"},
       {"extractor_id": "galvani", "method": "pip", "package": "galvani>=0.4"},
       {"extractor_id": "h5grove", "method": "pip", "package": "h5grove"},
       {"extractor_id": "newtool", "method": "pip", "package": "newtool==1.2"}]}"""

  test("a JSON registry client swaps in: connector and all r-queries track it, zero query changes") {
    import spark.implicits._
    def chosen(): Map[String, String] =
      SparkEntry.queries("r02_extractor_select")(spark, sf)
        .select($"filetype_id", $"chosen_extractor").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap

    val before = chosen()
    assert(before("biologic-mpr") == "yadg" && !before.contains("csv"),
      "builtin baseline unexpected — seam test premises broken")

    RegistryData.withBackend(new JsonRegistryClient(fixtureJson)) {
      // the DSv2 connector serves the client's rows
      val viaConnector = spark.read.format("graft-registry")
        .option("table", "filetypes").load()
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(viaConnector("csv") == List("newtool") && viaConnector("tiff") == Nil
        && viaConnector("biologic-mpr") == List("galvani", "yadg")
        && !viaConnector.contains("pdf"),
        s"connector rows do not match the JSON client: $viaConnector")

      // the query pack re-derives from the same client — the rank flip
      // and the new csv registration surface with zero query changes
      val swapped = chosen()
      assert(swapped("biologic-mpr") == "galvani",
        "r02 did not track the client's flipped rank order")
      assert(swapped("csv") == "newtool",
        "r02 did not see the client's new csv registration")

      // every r-query runs unmodified over the swapped registry, and the
      // dispatch/install chain carries the new extractor end-to-end
      val rNames = SparkEntry.allQueries.map(_.name).filter(_.startsWith("r"))
      assert(rNames.size >= 14)
      val outputs = rNames.map { n =>
        n -> SparkEntry.queries(n)(spark, sf).collect()
      }.toMap
      outputs.foreach { case (n, rows) =>
        assert(rows != null, s"$n failed against the swapped registry") }
      def mentionsNewtool(name: String): Boolean =
        outputs(name).exists(_.toSeq.exists {
          case s: String => s.contains("newtool")
          case _ => false
        })
      for (q <- Seq("r05_file_dispatch", "r07_install_plan", "r14_call_plan_parse"))
        assert(mentionsNewtool(q), s"$q does not carry the client's new extractor")
    }

    // builtin client restored: the same query reverts byte-for-byte
    assert(chosen() == before, "restoring the builtin backend did not revert r02")
  }
}
