package graft.charts

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/**
 * Vega-Lite chart emission. The reference renders every diagnostic chart
 * by filling a Vega-Lite spec's `data.values` with driver-side records
 * and handing the dict to altair (`charts.py:84-205` `SplinkChart`:
 * `chart_dict` = spec + records, `save_offline_chart` = HTML wrapper).
 * Here the same shape is a [[ChartSpec]]: a json4s tree with the data
 * embedded, renderable as JSON (`.json`) or a standalone HTML page
 * (`.html`/`.saveHtml`). Specs are original minimal Vega-Lite — the
 * reference's chart_defs JSONs define WHAT each chart shows (marks,
 * encodings, interactions); none of their JSON is reproduced.
 *
 * Chart data is always small by construction (model parameters, sampled
 * rows, per-threshold aggregates), so collecting it to the driver is the
 * correct distribution strategy — identical to the reference, which
 * materialises the same record lists before charting.
 */
final case class ChartSpec(spec: JValue) {
  /** The chart as a Vega-Lite JSON document. */
  def json: String = JsonMethods.pretty(JsonMethods.render(spec))

  /** Number of rows embedded at `data.values` (top-level datasets only). */
  def dataRowCount: Int = spec \ "data" \ "values" match {
    case JArray(vs) => vs.size
    case _          => 0
  }

  /** Standalone HTML. The page inlines the full spec (data included) and
    * loads the vega runtime from a public CDN — the reference instead
    * vendors the JS libs into its wheel (`charts.py:45-52`); in a
    * zero-egress build vendoring is impossible, so for fully-offline use
    * swap [[VegaLite.cdnScripts]] for local copies. */
  def html(title: String): String = VegaLite.htmlPage(title, spec)

  def saveHtml(path: String, title: String = "graft chart"): Unit = {
    val w = new java.io.PrintWriter(path, "UTF-8")
    try w.write(html(title)) finally w.close()
  }
}

object VegaLite {
  val SchemaUrl = "https://vega.github.io/schema/vega-lite/v5.json"

  val cdnScripts: String =
    """<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
      |<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
      |<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>""".stripMargin

  def htmlPage(title: String, spec: JValue): String = {
    val json = JsonMethods.compact(JsonMethods.render(spec))
      .replace("</", "<\\/") // keep </script> inside the JSON island inert
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${escapeHtml(title)}</title>
       |$cdnScripts
       |<style>body{font-family:sans-serif;margin:2em}</style></head>
       |<body><h2>${escapeHtml(title)}</h2><div id="vis"></div>
       |<script type="application/json" id="spec">$json</script>
       |<script>
       |"use strict";
       |const spec = JSON.parse(document.getElementById('spec').textContent);
       |// CDN scripts mirror the reference's chart pages; when they cannot
       |// load (offline/air-gapped), degrade to the raw spec instead of a
       |// silently blank page — the spec pastes into any Vega editor
       |if (typeof vegaEmbed !== 'undefined') {
       |  vegaEmbed('#vis', spec);
       |} else {
       |  const pre = document.createElement('pre');
       |  pre.textContent = JSON.stringify(spec, null, 2);
       |  const vis = document.getElementById('vis');
       |  vis.textContent = 'Vega scripts unavailable (offline?) — ' +
       |    'raw Vega-Lite spec below; paste into a Vega editor to render.';
       |  vis.appendChild(pre);
       |}
       |</script></body></html>""".stripMargin
  }

  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** One record as a JSON object; doubles NaN/Inf become null (JSON has no
    * representation and vega treats null as missing). */
  def record(fields: (String, Any)*): JObject =
    JObject(fields.toList.map { case (k, v) => JField(k, toJValue(v)) })

  def toJValue(v: Any): JValue = v match {
    case null                => JNull
    case None                => JNull
    case Some(x)             => toJValue(x)
    case d: Double           => if (d.isNaN || d.isInfinite) JNull else JDouble(d)
    case f: Float            => toJValue(f.toDouble)
    case i: Int              => JInt(BigInt(i))
    case l: Long             => JInt(BigInt(l))
    case s: Short            => JInt(BigInt(s.toInt))
    case b: Byte             => JInt(BigInt(b.toInt))
    case b: Boolean          => JBool(b)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case d: BigDecimal       => JDecimal(d)
    case s: String           => JString(s)
    case j: JValue           => j
    case m: scala.collection.Map[_, _] =>
      JObject(m.toList.map { case (k, x) => JField(k.toString, toJValue(x)) })
    case it: Iterable[_]     => JArray(it.toList.map(toJValue))
    case arr: Array[_]       => JArray(arr.toList.map(toJValue))
    case other               => JString(other.toString)
  }

  /** Collect a (small) DataFrame into chart records. */
  def dfRecords(df: DataFrame): List[JObject] = {
    val names = df.schema.fieldNames
    df.collect().toList.map { row =>
      JObject(names.zipWithIndex.toList.map { case (n, i) =>
        JField(n, toJValue(row.get(i)))
      })
    }
  }

  /** Minimal spec skeleton: schema + inline data + whatever else. */
  def spec(values: List[JObject], rest: JObject): JValue =
    ("$schema" -> SchemaUrl) ~ ("data" -> ("values" -> JArray(values))) merge rest

  def titled(text: String): JObject = "title" -> JObject(List(JField("text", JString(text))))
}
