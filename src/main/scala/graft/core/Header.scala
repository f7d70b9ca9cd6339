package graft.core

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.units.Units
import graft.units.Units.{Convention, Cosmology}

/** Dataset header (reference python/opencosmo/header.py:35 and
  * dtypes/file.py:34-43 — SURVEY.md §1.1): cosmology + file-level
  * metadata, persisted as a `_header.json` sidecar next to the parquet
  * data (the Spark mapping of the reference's HDF5 `header/` group).
  *
  * `columnUnits` maps column name → unit string in the BASE
  * (scalefree) convention, standing in for the reference's per-column
  * HDF5 `unit` attributes (units/get.py:171-201).
  */
final case class Header(
    dataType: String = "generic",
    redshift: Double = 0.0,
    step: Int = 0,
    isLightcone: Boolean = false,
    boxSize: Double = 0.0,
    unitConvention: String = Units.Scalefree.name,
    cosmology: Cosmology = Cosmology(),
    columnUnits: Map[String, String] = Map.empty,
    columnDescriptions: Map[String, String] = Map.empty,
    /** octree level of the stored `morton_key` column written by
      * OCIO.writeSpatial (0 = no stored spatial index) — the sidecar
      * record of the reference's persisted tree index
      * (spatial/tree.py:272-282 apply_index).
      */
    spatialIndexLevel: Int = 0,
    /** coordinate columns the stored index was built over — bound()
      * only takes the stored-key fast path when its `coords` match,
      * otherwise a query over different columns would silently reuse
      * a key derived from the wrong coordinates.
      */
    spatialIndexCoords: Seq[String] = Nil,
    /** HEALPix nside when dataType == "healpix_map" (0 otherwise). */
    healpixNside: Int = 0) {

  def convention: Convention = Convention.parse(unitConvention)
  def scaleFactor: Double = 1.0 / (1.0 + redshift)

  /** Field validation (reference: pydantic models, dtypes/file.py:34,
    * dtypes/hacc.py:28-68 — box_size ≥ 0 Mpc/h, plausible cosmology,
    * known convention). Throws with the offending field named; called
    * on every sidecar/HDF5 parse so malformed metadata fails at open
    * time, not deep inside a query.
    */
  def validated: Header = {
    def req(ok: Boolean, msg: => String): Unit =
      if (!ok) throw new IllegalArgumentException(s"invalid header: $msg")
    req(boxSize >= 0, s"box_size $boxSize < 0")
    req(redshift >= 0, s"redshift $redshift < 0")
    req(step >= 0, s"step $step < 0")
    req(Seq("scalefree", "comoving", "physical", "unitless").contains(unitConvention),
      s"unknown unit_convention '$unitConvention'")
    req(cosmology.h0 > 0 && cosmology.h0 < 200, s"implausible h0 ${cosmology.h0}")
    req(cosmology.omegaM >= 0 && cosmology.omegaM <= 2,
      s"implausible omega_m ${cosmology.omegaM}")
    req(cosmology.omegaL >= 0 && cosmology.omegaL <= 2,
      s"implausible omega_l ${cosmology.omegaL}")
    req(spatialIndexLevel >= 0 && spatialIndexLevel <= 20,
      s"spatial_index_level $spatialIndexLevel out of [0,20]")
    req(healpixNside >= 0 && (healpixNside & (healpixNside - 1)) == 0,
      s"healpix_nside $healpixNside not a power of two")
    this
  }

  def toJson: String = {
    // full JSON string escaping: control characters too — a newline
    // inside a description would otherwise write a sidecar that can
    // never be re-read (Jackson rejects raw control chars)
    def q(s: String) = {
      val b = new StringBuilder("\"")
      s.foreach {
        case '\\' => b.append("\\\\")
        case '"'  => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.append("\"").toString
    }
    def m(mm: Map[String, String]) =
      mm.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ", ", "}")
    s"""{
       |  "data_type": ${q(dataType)},
       |  "redshift": $redshift,
       |  "step": $step,
       |  "is_lightcone": $isLightcone,
       |  "box_size": $boxSize,
       |  "unit_convention": ${q(unitConvention)},
       |  "cosmology": {"h0": ${cosmology.h0}, "omega_m": ${cosmology.omegaM}, "omega_l": ${cosmology.omegaL}},
       |  "column_units": ${m(columnUnits)},
       |  "column_descriptions": ${m(columnDescriptions)},
       |  "spatial_index_level": $spatialIndexLevel,
       |  "spatial_index_coords": ${spatialIndexCoords.map(q).mkString("[", ", ", "]")},
       |  "healpix_nside": $healpixNside
       |}""".stripMargin
  }
}

object Header {
  private val mapper = new ObjectMapper()

  def fromJson(json: String): Header = {
    val n = mapper.readTree(json)
    def strMap(field: String): Map[String, String] = {
      val node = n.path(field)
      if (node.isMissingNode) Map.empty
      else {
        val it = node.fieldNames()
        Iterator.continually(if (it.hasNext) Some(it.next()) else None)
          .takeWhile(_.isDefined).flatten
          .map(k => k -> node.get(k).asText()).toMap
      }
    }
    val cos = n.path("cosmology")
    Header(
      dataType = n.path("data_type").asText("generic"),
      redshift = n.path("redshift").asDouble(0.0),
      step = n.path("step").asInt(0),
      isLightcone = n.path("is_lightcone").asBoolean(false),
      boxSize = n.path("box_size").asDouble(0.0),
      unitConvention = n.path("unit_convention").asText(Units.Scalefree.name),
      cosmology = Cosmology(cos.path("h0").asDouble(70.0),
        cos.path("omega_m").asDouble(0.3), cos.path("omega_l").asDouble(0.7)),
      columnUnits = strMap("column_units"),
      columnDescriptions = strMap("column_descriptions"),
      spatialIndexLevel = n.path("spatial_index_level").asInt(0),
      spatialIndexCoords = {
        val node = n.path("spatial_index_coords")
        if (node.isMissingNode || !node.isArray) Nil
        else (0 until node.size()).map(node.get(_).asText())
      },
      healpixNside = n.path("healpix_nside").asInt(0)).validated
  }

  def write(path: String, h: Header): Unit =
    Files.writeString(Paths.get(path, "_header.json"), h.toJson)

  def read(path: String): Header = {
    val p = Paths.get(path, "_header.json")
    if (Files.exists(p)) fromJson(Files.readString(p)) else Header()
  }
}
