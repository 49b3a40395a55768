"""Single-page UI for the HTTP shell — functional parity with the
reference's SPA (``index.html``: three tabs driving the /api routes —
ingestion form, dataset explorer with preview table + CSV download +
delete, transformation form).

Original implementation: the reference page is Tailwind/FontAwesome from
CDNs; this container is offline, so the page is dependency-free vanilla
HTML/CSS/JS.  Everything renders client-side against the same /api
surface (`routes.py` ≙ :mod:`.api`), so the page works against any host
serving this app.
"""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Financial Data Pipeline</title>
<style>
  :root { --ink:#1a2332; --line:#d8dee6; --accent:#2563eb; --soft:#f4f6f9; }
  body { font-family: system-ui, sans-serif; margin:0; color:var(--ink); }
  header { padding:1rem 2rem; border-bottom:1px solid var(--line); }
  header h1 { margin:0; font-size:1.25rem; }
  nav { display:flex; gap:.25rem; padding:0 2rem; border-bottom:1px solid var(--line); }
  nav button { border:0; background:none; padding:.75rem 1.25rem; cursor:pointer;
               font-size:.95rem; border-bottom:2px solid transparent; }
  nav button.active { border-bottom-color:var(--accent); color:var(--accent); font-weight:600; }
  main { padding:1.5rem 2rem; max-width:72rem; }
  section.tab { display:none; } section.tab.visible { display:block; }
  label { display:block; margin:.6rem 0 .2rem; font-size:.85rem; }
  input, select, textarea { padding:.4rem .5rem; border:1px solid var(--line);
                            border-radius:4px; min-width:16rem; font:inherit; }
  button.action { margin-top:1rem; padding:.5rem 1.1rem; border:0; border-radius:4px;
                  background:var(--accent); color:#fff; cursor:pointer; }
  button.minor { background:var(--soft); color:var(--ink); border:1px solid var(--line); }
  pre#status { background:var(--soft); padding:.75rem; border-radius:4px;
               white-space:pre-wrap; min-height:1.2rem; }
  table { border-collapse:collapse; margin-top:1rem; font-size:.85rem; }
  th, td { border:1px solid var(--line); padding:.3rem .6rem; text-align:left; }
  th { background:var(--soft); }
  ul#datasetList { list-style:none; padding:0; }
  ul#datasetList li { padding:.35rem .5rem; border:1px solid var(--line);
                      border-radius:4px; margin:.25rem 0; cursor:pointer; }
  ul#datasetList li:hover { background:var(--soft); }
</style>
</head>
<body>
<header><h1>Financial Data Pipeline — PySpark engine</h1></header>
<nav>
  <button id="tab-ingest-btn"    onclick="showTab('ingest')">Data Ingestion</button>
  <button id="tab-explore-btn"   onclick="showTab('explore')">Data Explorer</button>
  <button id="tab-transform-btn" onclick="showTab('transform')">Transformation</button>
</nav>
<main>
  <pre id="status"></pre>

  <section class="tab" id="tab-ingest">
    <h2>Ingest market data</h2>
    <label>Source
      <select id="ing-source">
        <option>alphavantage</option><option>yahoo</option><option>csv</option>
      </select></label>
    <label>Data type
      <select id="ing-type">
        <option>stock</option><option>forex</option><option>crypto</option><option>economic</option>
      </select></label>
    <label>Symbols (comma-separated)<input id="ing-symbols" placeholder="AAPL,MSFT"></label>
    <label>Start date <input id="ing-start" type="date"></label>
    <label>End date <input id="ing-end" type="date"></label>
    <button class="action" onclick="runIngest()">Start ingestion</button>
  </section>

  <section class="tab" id="tab-explore">
    <h2>Explore datasets</h2>
    <label>Layer
      <select id="exp-layer" onchange="loadDatasets()">
        <option>bronze</option><option>silver</option><option>gold</option>
      </select></label>
    <button class="action minor" onclick="loadDatasets()">Refresh list</button>
    <ul id="datasetList"></ul>
    <div id="datasetInfo"></div>
    <div id="dataActions" style="display:none">
      <button class="action minor" onclick="downloadCsv()">Download CSV</button>
      <button class="action minor" onclick="deleteDataset()">Delete dataset</button>
    </div>
    <div style="overflow-x:auto"><table id="previewTable">
      <thead id="previewHead"></thead><tbody id="previewBody"></tbody>
    </table></div>
  </section>

  <section class="tab" id="tab-transform">
    <h2>Transform a dataset</h2>
    <label>Source path (layer/name)<input id="tr-src" placeholder="bronze/yahoo_stock_20240102"></label>
    <label>Destination path (layer/name)<input id="tr-dst" placeholder="silver/yahoo_stock_20240102"></label>
    <label>Transformation
      <select id="tr-type">
        <option>clean</option><option>normalize</option><option>aggregate</option>
      </select></label>
    <label>Params (JSON)<textarea id="tr-params" rows="3">{}</textarea></label>
    <button class="action" onclick="runTransform()">Run transformation</button>
  </section>
</main>

<script>
const $ = id => document.getElementById(id);
let selectedDataset = null;

function showTab(name) {
  for (const t of ['ingest', 'explore', 'transform']) {
    $('tab-' + t).classList.toggle('visible', t === name);
    $('tab-' + t + '-btn').classList.toggle('active', t === name);
  }
  if (name === 'explore') loadDatasets();
}

function report(obj, isError) {
  $('status').textContent = typeof obj === 'string' ? obj : JSON.stringify(obj, null, 2);
  $('status').style.color = isError ? '#b91c1c' : 'inherit';
}

async function call(path, opts) {
  const resp = await fetch(path, opts);
  const body = resp.headers.get('content-type')?.includes('json')
    ? await resp.json() : await resp.text();
  if (!resp.ok) { report(body, true); throw new Error('http ' + resp.status); }
  return body;
}

async function runIngest() {
  const payload = {
    source: $('ing-source').value,
    data_type: $('ing-type').value,
    symbols: $('ing-symbols').value.split(',').map(s => s.trim()).filter(Boolean),
    start_date: $('ing-start').value || null,
    end_date: $('ing-end').value || null,
  };
  report(await call('/api/ingest', {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(payload),
  }));
  loadDatasets();
}

async function loadDatasets() {
  const layer = $('exp-layer').value;
  const listing = await call('/api/datasets');
  const ul = $('datasetList');
  ul.innerHTML = '';
  for (const name of listing[layer] || []) {
    const li = document.createElement('li');
    li.textContent = name;
    li.onclick = () => openDataset(name);
    ul.appendChild(li);
  }
}

// Server data is untrusted at render time (a symbol ingested as
// "<img onerror=...>" must not execute in the Explorer): all dynamic
// values go through textContent, never innerHTML.
function el(tag, text) {
  const node = document.createElement(tag);
  if (text !== undefined) node.textContent = text;
  return node;
}

async function openDataset(name) {
  selectedDataset = name;
  const layer = $('exp-layer').value;
  const info = await call(`/api/datasets/${encodeURIComponent(name)}?layer=${layer}`);
  const box = $('datasetInfo');
  box.replaceChildren(
    el('h3', name),
    el('p', `${info.record_count} records · source ${info.source}` +
            (info.first_date ? ` · ${info.first_date} → ${info.last_date}` : '')),
  );
  $('dataActions').style.display = 'block';
  const rows = await call(`/api/data/${layer}/${encodeURIComponent(name)}?limit=100`);
  renderPreview(rows);
}

function renderPreview(rows) {
  const head = $('previewHead'), body = $('previewBody');
  head.replaceChildren(); body.replaceChildren();
  if (!rows.length) {
    const tr = el('tr'); tr.appendChild(el('td', 'empty dataset'));
    body.appendChild(tr);
    return;
  }
  const cols = Object.keys(rows[0]);
  const hr = el('tr');
  for (const c of cols) hr.appendChild(el('th', c));
  head.appendChild(hr);
  for (const r of rows) {
    const tr = el('tr');
    for (const c of cols) tr.appendChild(el('td', r[c] ?? ''));
    body.appendChild(tr);
  }
}

function downloadCsv() {
  if (selectedDataset)
    window.open(`/api/data/${$('exp-layer').value}/${encodeURIComponent(selectedDataset)}/download`);
}

async function deleteDataset() {
  if (!selectedDataset) return;
  await call(`/api/datasets/${encodeURIComponent(selectedDataset)}?layer=${$('exp-layer').value}`,
             {method: 'DELETE'});
  report(`deleted ${selectedDataset}`);
  selectedDataset = null;
  $('dataActions').style.display = 'none';
  $('datasetInfo').innerHTML = '';
  loadDatasets();
}

async function runTransform() {
  let params;
  try { params = JSON.parse($('tr-params').value || '{}'); }
  catch (e) { report('params is not valid JSON: ' + e.message, true); return; }
  report(await call('/api/transform', {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({
      source_path: $('tr-src').value,
      destination_path: $('tr-dst').value,
      transformation_type: $('tr-type').value,
      params,
    }),
  }));
}

showTab('ingest');
</script>
</body>
</html>"""
