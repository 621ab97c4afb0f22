package graft.charts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.{Cols, LinkSettings}
import graft.model.SettingsJson

/**
 * Standalone HTML dashboards mirroring the reference's comparison viewer
 * (`splink_comparison_viewer.py:85-239`) and cluster studio
 * (`cluster_studio.py:157-436`). The DATA contract matches the reference
 * — per-gamma-pattern example rows + pattern counts for the viewer,
 * sampled clusters' nodes + edges for the studio — while the renderer is
 * original: a dependency-free HTML page (inline JS + SVG, no external
 * libraries, works fully offline) instead of the reference's bundled
 * vendor JS. Everything distributed happens in the example-row /
 * sampling queries below; the page only ever embeds the already-small
 * sampled result.
 */
object Dashboards {

  // ------------------------------------------------------ comparison viewer

  /** Example rows per distinct comparison-vector pattern — the
    * reference's `__splink__df_comparison_viewer_table`
    * (`splink_comparison_viewer.py:85-146`): per pattern, up to
    * `examplesPerCategory` representative rows plus the pattern's pair
    * count and proportion. Deterministic: examples are the lowest
    * (uid_l, uid_r) of the pattern, not `random()`, so the table is
    * stable across runs and engines (and DuckDB-oracle checkable). */
  def viewerExampleRows(predictions: DataFrame, settings: LinkSettings,
      examplesPerCategory: Int = 2,
      minimumComparisonVectorCount: Long = 0L): DataFrame = {
    val uidL = Cols.l(settings.uniqueIdColumn)
    val uidR = Cols.r(settings.uniqueIdColumn)
    val gammaCols = settings.comparisons.map(c => col(c.gammaColumnName))
    val gamConcat = concat_ws(",", gammaCols.map(_.cast("string")): _*)
    // average match weight of the pattern WITHOUT tf adjustment — a pure
    // function of the gammas, so constant per pattern; the reference
    // sorts patterns by it for exactly this reason
    // (`splink_comparison_viewer.py:31-40`, upstream issue 1651)
    val mwNoTf = settings.comparisons.map(_.matchWeightColumn)
      .foldLeft(lit(settings.priorMatchWeight))(_ + _)
    val byPattern = Window.partitionBy(col("gam_concat"))
    // ONE shuffle on gam_concat does both the per-pattern count and the
    // example pick; the total-count denominator is then a window over the
    // already-tiny example frame (<= examplesPerCategory rows per
    // pattern), never over the full predict output — each pattern's count
    // is carried once on its first example row, so summing those equals
    // the full pair count without a second pass
    val examples = predictions
      .withColumn("gam_concat", gamConcat)
      .withColumn("sort_avg_match_weight", mwNoTf)
      .withColumn("row_example_index", row_number().over(
        byPattern.orderBy(col(uidL), col(uidR))))
      .withColumn("count_rows_in_comparison_vector_group",
        count(lit(1)).over(byPattern))
      .filter(col("row_example_index") <= examplesPerCategory)
    examples
      .withColumn("proportion_of_comparisons",
        col("count_rows_in_comparison_vector_group").cast("double") /
          sum(when(col("row_example_index") === 1,
              col("count_rows_in_comparison_vector_group")))
            .over(Window.partitionBy()))
      .filter(col("count_rows_in_comparison_vector_group") >=
        minimumComparisonVectorCount)
  }

  /** Self-contained comparison-viewer HTML: pattern list (sorted by the
    * no-TF pattern weight), example rows, and a per-row match-weight
    * waterfall drawn as inline SVG from the embedded model parameters. */
  def comparisonViewerHtml(predictions: DataFrame, settings: LinkSettings,
      examplesPerCategory: Int = 2,
      minimumComparisonVectorCount: Long = 0L): String = {
    val rows = viewerExampleRows(predictions, settings, examplesPerCategory,
      minimumComparisonVectorCount)
    val records = JArray(VegaLite.dfRecords(rows))
    val model = JsonMethods.parse(SettingsJson.toJson(settings))
    // per-comparison level metadata for the JS waterfall: gamma -> weight
    val comparisons = JArray(settings.comparisons.toList.map { c =>
      JObject(List(
        JField("name", JString(c.outputColumnName)),
        JField("gamma_column", JString(c.gammaColumnName)),
        JField("levels", JArray(c.activeLevelsWithGamma.toList.map {
          case (lv, g) => JObject(List(
            JField("gamma", JInt(g)),
            JField("label", JString(lv.label)),
            JField("log2_bayes_factor", JDouble(lv.matchWeight))))
        }))))
    })
    val payload = JObject(List(
      JField("rows", records),
      JField("comparisons", comparisons),
      JField("prior_match_weight", JDouble(settings.priorMatchWeight)),
      JField("model", model)))
    htmlShell("Comparison viewer", payload, ViewerJs)
  }

  // --------------------------------------------------------- cluster studio

  /** Nodes + edges of a set of sampled clusters, ready to embed — the
    * reference's `df_nodes_as_records` / `df_edges_as_records` for its
    * chosen cluster ids (`cluster_studio.py:60-155`). One semi-join each;
    * the sample frame is tiny and broadcast. */
  def clusterStudioData(clusteredNodes: DataFrame, edges: DataFrame,
      clusterIds: DataFrame,
      nodeIdCol: String = "node_id", clusterIdCol: String = "cluster_id",
      srcCol: String = "unique_id_l",
      dstCol: String = "unique_id_r"): (DataFrame, DataFrame) = {
    val ids = broadcast(clusterIds.select(clusterIdCol).distinct())
    val nodes = clusteredNodes.join(ids, Seq(clusterIdCol), "left_semi")
    // an edge belongs to a sampled cluster only when BOTH endpoints are in
    // that cluster: the caller may pass the full unthresholded predict
    // output, whose cross-cluster edges must not appear in (or inflate the
    // counts of) a cluster's view — the reference's edge query filters on
    // both endpoints too (`cluster_studio.py:101-155`)
    val nodeCluster = nodes.select(col(nodeIdCol).as("__nid"),
      col(clusterIdCol).as("__cid"))
    val keptEdges = edges
      .join(broadcast(nodeCluster), col(srcCol) === col("__nid"))
      .join(broadcast(nodeCluster
          .withColumnRenamed("__nid", "__nid2")
          .withColumnRenamed("__cid", "__cid2")),
        col(dstCol) === col("__nid2") && col("__cid") === col("__cid2"))
      .withColumnRenamed("__cid", clusterIdCol)
      .drop("__nid", "__nid2", "__cid2")
    (nodes, keptEdges)
  }

  /** Self-contained cluster-studio HTML
    * (`cluster_studio.py:346-436` `render_splink_cluster_studio_html`):
    * cluster selector, force-free circular node-link SVG (edge opacity =
    * match probability), node and edge tables. */
  def clusterStudioHtml(clusteredNodes: DataFrame, edges: DataFrame,
      clusterIds: DataFrame,
      nodeIdCol: String = "node_id", clusterIdCol: String = "cluster_id",
      srcCol: String = "unique_id_l", dstCol: String = "unique_id_r"): String = {
    val (nodes, keptEdges) = clusterStudioData(clusteredNodes, edges,
      clusterIds, nodeIdCol, clusterIdCol, srcCol, dstCol)
    val payload = JObject(List(
      JField("nodes", JArray(VegaLite.dfRecords(nodes))),
      JField("edges", JArray(VegaLite.dfRecords(keptEdges))),
      JField("node_id_col", JString(nodeIdCol)),
      JField("cluster_id_col", JString(clusterIdCol)),
      JField("src_col", JString(srcCol)),
      JField("dst_col", JString(dstCol))))
    htmlShell("Cluster studio", payload, StudioJs)
  }

  // --------------------------------------------------------- labelling tool

  /** Offline labelling-tool page (`labelling_tool.py:73-130`): candidate
    * pairs for one record, three-way labels (match / not match / unsure
    * -> clerical scores 1 / 0 / 0.5, the reference's convention), and a
    * JSON export of the labels in the pairwise-labels shape accepted by
    * m-from-labels training. */
  def labellingToolHtml(comparisons: DataFrame,
      settings: LinkSettings): String = {
    val uid = settings.uniqueIdColumn
    val payload = JObject(List(
      JField("rows", JArray(VegaLite.dfRecords(comparisons))),
      JField("uid_l_col", JString(Cols.l(uid))),
      JField("uid_r_col", JString(Cols.r(uid)))))
    htmlShell("Labelling tool", payload, LabellingJs)
  }

  // ----------------------------------------------------------------- shell

  private def htmlShell(title: String, payload: JValue, js: String): String = {
    val json = JsonMethods.compact(JsonMethods.render(payload))
      .replace("</", "<\\/")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8">
       |<title>${VegaLite.escapeHtml(title)}</title>
       |<style>
       |body{font-family:sans-serif;margin:1.5em;color:#222}
       |select{font-size:1em;margin:0.5em 0;max-width:100%}
       |table{border-collapse:collapse;margin:0.8em 0;font-size:0.85em}
       |th,td{border:1px solid #ccc;padding:3px 8px;text-align:left}
       |th{background:#f0f0f0}
       |.pos{fill:#2a9d42}.neg{fill:#c0392b}
       |svg{margin:0.5em 0;border:1px solid #eee}
       |.meta{color:#666;font-size:0.9em}
       |</style></head>
       |<body><h2>${VegaLite.escapeHtml(title)}</h2>
       |<div id="app"></div>
       |<script type="application/json" id="data">$json</script>
       |<script>
       |"use strict";
       |const DATA = JSON.parse(document.getElementById('data').textContent);
       |// every DATA value rendered into markup goes through esc(): the
       |// JSON island is injection-safe, but innerHTML/SVG strings are not
       |function esc(v) { return String(v).replace(/&/g, '&amp;')
       |  .replace(/</g, '&lt;').replace(/>/g, '&gt;')
       |  .replace(/"/g, '&quot;'); }
       |$js
       |</script></body></html>""".stripMargin
  }

  def saveHtml(html: String, path: String): Unit = {
    val w = new java.io.PrintWriter(path, "UTF-8")
    try w.write(html) finally w.close()
  }

  /** Original viewer JS: pattern dropdown -> example-row tables, each with
    * an SVG waterfall of prior + per-comparison weights (no-TF, from the
    * embedded level metadata). */
  private val ViewerJs: String =
    """const app = document.getElementById('app');
      |const patterns = {};
      |for (const r of DATA.rows) {
      |  (patterns[r.gam_concat] = patterns[r.gam_concat] || []).push(r);
      |}
      |const keys = Object.keys(patterns).sort((a, b) =>
      |  patterns[b][0].sort_avg_match_weight - patterns[a][0].sort_avg_match_weight);
      |const sel = document.createElement('select');
      |for (const k of keys) {
      |  const o = document.createElement('option');
      |  const p = patterns[k][0];
      |  o.value = k;
      |  o.textContent = 'pattern [' + k + ']  weight ' +
      |    p.sort_avg_match_weight.toFixed(2) + '  (' +
      |    p.count_rows_in_comparison_vector_group + ' pairs, ' +
      |    (100 * p.proportion_of_comparisons).toFixed(2) + '%)';
      |  sel.appendChild(o);
      |}
      |const detail = document.createElement('div');
      |app.appendChild(sel); app.appendChild(detail);
      |function waterfallSvg(row) {
      |  const terms = [{label: 'prior', w: DATA.prior_match_weight}];
      |  for (const c of DATA.comparisons) {
      |    const g = row[c.gamma_column];
      |    const lv = c.levels.find(l => l.gamma === g);
      |    terms.push({label: c.name, w: lv ? lv.log2_bayes_factor : 0});
      |  }
      |  let cum = 0; const bars = [];
      |  for (const t of terms) { bars.push({label: t.label, s: cum, e: cum + t.w, w: t.w}); cum += t.w; }
      |  bars.push({label: 'final', s: 0, e: cum, w: cum});
      |  const min = Math.min(0, ...bars.map(b => Math.min(b.s, b.e)));
      |  const max = Math.max(0, ...bars.map(b => Math.max(b.s, b.e)));
      |  const W = 420, H = 120, bw = W / bars.length;
      |  const y = v => 10 + (H - 20) * (max - v) / (max - min || 1);
      |  let s = '<svg width="' + W + '" height="' + (H + 30) + '">';
      |  bars.forEach((b, i) => {
      |    const top = Math.min(y(b.s), y(b.e));
      |    const h = Math.max(Math.abs(y(b.s) - y(b.e)), 1);
      |    s += '<rect class="' + (b.w >= 0 ? 'pos' : 'neg') + '" x="' + (i * bw + 3) +
      |      '" y="' + top + '" width="' + (bw - 6) + '" height="' + h + '">' +
      |      '<title>' + esc(b.label) + ': ' + b.w.toFixed(3) + '</title></rect>';
      |    s += '<text x="' + (i * bw + bw / 2) + '" y="' + (H + 22) +
      |      '" font-size="9" text-anchor="middle">' + esc(b.label) + '</text>';
      |  });
      |  s += '<line x1="0" x2="' + W + '" y1="' + y(0) + '" y2="' + y(0) +
      |    '" stroke="#999" stroke-dasharray="3"/></svg>';
      |  return s;
      |}
      |function render() {
      |  const rows = patterns[sel.value];
      |  const cols = Object.keys(rows[0]).filter(c =>
      |    c !== 'gam_concat' && c !== 'row_example_index');
      |  let h = '';
      |  for (const r of rows) {
      |    h += '<table><tr>' + cols.map(c => '<th>' + esc(c) + '</th>').join('') + '</tr>';
      |    h += '<tr>' + cols.map(c => '<td>' + (r[c] === null ? '' : esc(r[c])) + '</td>').join('') + '</tr></table>';
      |    h += waterfallSvg(r);
      |  }
      |  detail.innerHTML = h;
      |}
      |sel.addEventListener('change', render);
      |if (keys.length) { sel.value = keys[0]; render(); }
      |else { detail.textContent = 'No comparison rows.'; }""".stripMargin

  /** Original labelling JS: per-candidate label buttons + JSON export. */
  private val LabellingJs: String =
    """const app = document.getElementById('app');
      |const UL = DATA.uid_l_col, UR = DATA.uid_r_col;
      |const rows = DATA.rows.slice().sort((a, b) => b.match_weight - a.match_weight);
      |const labels = {};
      |const out = document.createElement('textarea');
      |out.rows = 6; out.style.width = '100%';
      |out.placeholder = 'Labelled pairs appear here as JSON.';
      |function key(r) { return r[UL] + '|' + r[UR]; }
      |function exportLabels() {
      |  const recs = [];
      |  for (const r of rows) {
      |    const v = labels[key(r)];
      |    if (v !== undefined) recs.push({
      |      [UL]: r[UL], [UR]: r[UR], clerical_match_score: v});
      |  }
      |  out.value = JSON.stringify(recs, null, 1);
      |}
      |let h = '<table><tr><th></th>';
      |const cols = Object.keys(rows.length ? rows[0] : {})
      |  .filter(c => c.endsWith('_l') || c.endsWith('_r') ||
      |    c === 'match_weight' || c === 'match_probability');
      |h += cols.map(c => '<th>' + c + '</th>').join('') + '</tr>';
      |rows.forEach((r, i) => {
      |  h += '<tr id="row' + i + '"><td>' +
      |    '<button data-i="' + i + '" data-v="1">match</button>' +
      |    '<button data-i="' + i + '" data-v="0">not</button>' +
      |    '<button data-i="' + i + '" data-v="0.5">unsure</button></td>' +
      |    cols.map(c => '<td>' + (r[c] === null ? '' :
      |      (typeof r[c] === 'number' && !Number.isInteger(r[c]) ?
      |        r[c].toFixed(4) : r[c])) + '</td>').join('') + '</tr>';
      |});
      |h += '</table>';
      |const tbl = document.createElement('div');
      |tbl.innerHTML = h;
      |app.appendChild(tbl); app.appendChild(out);
      |tbl.addEventListener('click', ev => {
      |  const b = ev.target.closest('button');
      |  if (!b) return;
      |  labels[key(rows[+b.dataset.i])] = +b.dataset.v;
      |  document.getElementById('row' + b.dataset.i).style.background =
      |    {1: '#d9f2d9', 0: '#f5d6d6', 0.5: '#f7f3d4'}[+b.dataset.v];
      |  exportLabels();
      |});
      |if (!rows.length) app.textContent = 'No candidate pairs above threshold.';""".stripMargin

  /** Original studio JS: cluster dropdown -> circular-layout node-link SVG
    * plus node/edge tables. */
  private val StudioJs: String =
    """const app = document.getElementById('app');
      |const CID = DATA.cluster_id_col, NID = DATA.node_id_col;
      |const SRC = DATA.src_col, DST = DATA.dst_col;
      |const clusters = {};
      |for (const n of DATA.nodes) {
      |  (clusters[n[CID]] = clusters[n[CID]] || {nodes: [], edges: []}).nodes.push(n);
      |}
      |for (const e of DATA.edges) {
      |  if (clusters[e[CID]]) clusters[e[CID]].edges.push(e);
      |}
      |const keys = Object.keys(clusters).sort((a, b) =>
      |  clusters[b].nodes.length - clusters[a].nodes.length);
      |const sel = document.createElement('select');
      |for (const k of keys) {
      |  const o = document.createElement('option');
      |  o.value = k;
      |  o.textContent = 'Cluster ' + k + '  (' + clusters[k].nodes.length +
      |    ' nodes, ' + clusters[k].edges.length + ' edges)';
      |  sel.appendChild(o);
      |}
      |const detail = document.createElement('div');
      |app.appendChild(sel); app.appendChild(detail);
      |function table(rows, cols) {
      |  if (!rows.length) return '<p class="meta">none</p>';
      |  let h = '<table><tr>' + cols.map(c => '<th>' + c + '</th>').join('') + '</tr>';
      |  for (const r of rows) h += '<tr>' +
      |    cols.map(c => '<td>' + (r[c] === null ? '' : r[c]) + '</td>').join('') + '</tr>';
      |  return h + '</table>';
      |}
      |function render() {
      |  const c = clusters[sel.value];
      |  const n = c.nodes.length, W = 460, H = 380, R = Math.min(W, H) / 2 - 40;
      |  const pos = {};
      |  c.nodes.forEach((nd, i) => {
      |    const a = 2 * Math.PI * i / n;
      |    pos[nd[NID]] = [W / 2 + R * Math.cos(a), H / 2 + R * Math.sin(a)];
      |  });
      |  let s = '<svg width="' + W + '" height="' + H + '">';
      |  for (const e of c.edges) {
      |    const p = pos[e[SRC]], q = pos[e[DST]];
      |    if (!p || !q) continue;
      |    const op = e.match_probability != null ?
      |      (0.15 + 0.85 * e.match_probability) : 0.6;
      |    s += '<line x1="' + p[0] + '" y1="' + p[1] + '" x2="' + q[0] +
      |      '" y2="' + q[1] + '" stroke="#4a7db5" stroke-opacity="' + op +
      |      '" stroke-width="1.5"><title>' + e[SRC] + ' - ' + e[DST] +
      |      (e.match_probability != null ?
      |        ' (p=' + Number(e.match_probability).toFixed(4) + ')' : '') +
      |      '</title></line>';
      |  }
      |  for (const nd of c.nodes) {
      |    const p = pos[nd[NID]];
      |    s += '<circle cx="' + p[0] + '" cy="' + p[1] +
      |      '" r="7" fill="#e67e22"><title>' + nd[NID] + '</title></circle>';
      |    s += '<text x="' + p[0] + '" y="' + (p[1] - 10) +
      |      '" font-size="9" text-anchor="middle">' + nd[NID] + '</text>';
      |  }
      |  s += '</svg>';
      |  detail.innerHTML = s +
      |    '<h3>Nodes</h3>' + table(c.nodes, Object.keys(c.nodes[0])) +
      |    '<h3>Edges</h3>' + table(c.edges,
      |      c.edges.length ? Object.keys(c.edges[0]) : []);
      |}
      |sel.addEventListener('change', render);
      |if (keys.length) { sel.value = keys[0]; render(); }
      |else { detail.textContent = 'No clusters sampled.'; }""".stripMargin
}
