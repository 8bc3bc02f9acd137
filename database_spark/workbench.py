"""Workbench HTML UI — the interactive query/update/explore/namespace
page humans point a browser at.

Reference: ``bigdata-war-html/src/main/webapp/html/index.html`` +
``bigdata-sails/.../webapp/WorkbenchServlet.java`` (tabs: QUERY,
UPDATE, EXPLORE, NAMESPACES, STATUS).  This is an original minimal
single-file implementation over the same REST surface this server
already exposes:

- QUERY tab   → ``GET <ns>/sparql?query=&format=&limit=&offset=``
- UPDATE tab  → ``POST <ns>/sparql`` (urlencoded ``update=``)
- EXPLORE tab → ``GET <ns>/sparql?GETSTMTS&s=<uri>`` (outgoing) and
  ``&o=<uri>`` (incoming) — the explore-by-URI view
- NAMESPACES  → ``GET /namespace`` (list) / ``POST /namespace``
  (Properties body create) / per-namespace sparql routing
- STATUS      → links to ``/status`` and ``/status?health``

No external assets (no CDN, no framework): one self-contained page.
"""

WORKBENCH_PATHS = ("", "workbench", "index.html")

WORKBENCH_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>database_spark workbench</title>
<style>
 body { font-family: sans-serif; margin: 1em; }
 nav button { margin-right: .4em; padding: .4em .8em; cursor: pointer; }
 nav button.active { font-weight: bold; border-bottom: 3px solid #36c; }
 .tab { display: none; margin-top: 1em; }
 .tab.visible { display: block; }
 textarea { width: 100%; height: 10em; font-family: monospace; }
 pre { background: #f4f4f4; padding: .6em; overflow: auto; }
 table { border-collapse: collapse; }
 td, th { border: 1px solid #999; padding: .2em .5em; font-family: monospace; }
 #current-namespace { color: #36c; }
 .err { color: #a00; white-space: pre-wrap; }
</style>
</head>
<body>
<h2>database_spark workbench
  <small>namespace: <span id="current-namespace">kb</span></small></h2>
<nav>
 <button data-tab="query-tab" class="active">Query</button>
 <button data-tab="update-tab">Update</button>
 <button data-tab="explore-tab">Explore</button>
 <button data-tab="namespaces-tab">Namespaces</button>
 <a href="/status" target="_blank">Status</a>
 <a href="/status?health" target="_blank">Health</a>
</nav>

<div id="query-tab" class="tab visible">
 <textarea id="query-box">SELECT * WHERE { ?s ?p ?o } LIMIT 10</textarea>
 <label>Format
  <select id="query-format">
   <option value="json">JSON</option>
   <option value="xml">XML</option>
   <option value="csv">CSV</option>
   <option value="tsv">TSV</option>
  </select></label>
 <label>Limit <input id="query-limit" size="6"/></label>
 <label>Offset <input id="query-offset" size="6"/></label>
 <button id="query-run">Run</button>
 <div id="query-results"></div>
</div>

<div id="update-tab" class="tab">
 <textarea id="update-box">INSERT DATA { }</textarea>
 <button id="update-run">Run update</button>
 <pre id="update-results"></pre>
</div>

<div id="explore-tab" class="tab">
 <form id="explore-form">
  <input id="explore-uri" size="60" placeholder="http://example.org/resource"/>
  <button type="submit">Explore</button>
 </form>
 <h4>Outgoing</h4><pre id="explore-outgoing"></pre>
 <h4>Incoming</h4><pre id="explore-incoming"></pre>
</div>

<div id="namespaces-tab" class="tab">
 <ul id="namespaces-list"></ul>
 <input id="new-namespace-name" placeholder="new namespace"/>
 <button id="namespace-create">Create</button>
 <pre id="namespace-errors" class="err"></pre>
</div>

<script>
"use strict";
let ns = "kb";
function sparqlUrl() { return "/namespace/" + encodeURIComponent(ns) + "/sparql"; }
function show(tab) {
  document.querySelectorAll(".tab").forEach(t => t.classList.remove("visible"));
  document.getElementById(tab).classList.add("visible");
  document.querySelectorAll("nav button").forEach(b =>
    b.classList.toggle("active", b.dataset.tab === tab));
}
document.querySelectorAll("nav button").forEach(b =>
  b.addEventListener("click", () => show(b.dataset.tab)));

function renderBindings(data, el) {
  const vars = data.head.vars, rows = data.results.bindings;
  let html = "<table><tr>" + vars.map(v => {
    const th = document.createElement("th");
    th.textContent = v;
    return th.outerHTML;
  }).join("") + "</tr>";
  for (const r of rows) {
    html += "<tr>" + vars.map(v => {
      const t = r[v];
      if (!t) return "<td></td>";
      const val = document.createElement("td");
      val.textContent = t.value;
      return val.outerHTML;
    }).join("") + "</tr>";
  }
  el.innerHTML = html + "</table><p>" + rows.length + " results</p>";
}

document.getElementById("query-run").addEventListener("click", async () => {
  const out = document.getElementById("query-results");
  const fmt = document.getElementById("query-format").value;
  const p = new URLSearchParams({query: document.getElementById("query-box").value, format: fmt});
  const lim = document.getElementById("query-limit").value;
  const off = document.getElementById("query-offset").value;
  if (lim) p.set("limit", lim);
  if (off) p.set("offset", off);
  const resp = await fetch(sparqlUrl() + "?" + p);
  const text = await resp.text();
  if (!resp.ok) { out.innerHTML = "<pre class=err></pre>"; out.firstChild.textContent = text; return; }
  if (fmt === "json") {
    try { renderBindings(JSON.parse(text), out); return; } catch (e) { /* ASK etc. */ }
  }
  out.innerHTML = "<pre></pre>"; out.firstChild.textContent = text;
});

document.getElementById("update-run").addEventListener("click", async () => {
  const out = document.getElementById("update-results");
  const resp = await fetch(sparqlUrl(), {
    method: "POST",
    headers: {"Content-Type": "application/x-www-form-urlencoded"},
    body: new URLSearchParams({update: document.getElementById("update-box").value}),
  });
  out.textContent = (resp.ok ? "OK " : "ERROR ") + await resp.text();
});

document.getElementById("explore-form").addEventListener("submit", async ev => {
  ev.preventDefault();
  const uri = "<" + document.getElementById("explore-uri").value + ">";
  for (const [param, el] of [["s", "explore-outgoing"], ["o", "explore-incoming"]]) {
    const p = new URLSearchParams({GETSTMTS: ""}); p.set(param, uri);
    // N-Quads: quads-mode namespaces show the graph term as a 4th
    // column; for triples-only stores the output is plain N-Triples
    const resp = await fetch(sparqlUrl() + "?" + p,
                             {headers: {"Accept": "application/n-quads"}});
    document.getElementById(el).textContent = await resp.text();
  }
});

async function refreshNamespaces() {
  const resp = await fetch("/namespace");
  const xml = new DOMParser().parseFromString(await resp.text(), "text/xml");
  const list = document.getElementById("namespaces-list");
  list.innerHTML = "";
  for (const t of xml.querySelectorAll("namespace")) {
    const name = t.getAttribute("name");
    const li = document.createElement("li");
    const use = document.createElement("button");
    use.textContent = "use";
    use.addEventListener("click", () => {
      ns = name;
      document.getElementById("current-namespace").textContent = ns;
    });
    const props = document.createElement("a");
    props.textContent = "properties";
    props.href = "/namespace/" + encodeURIComponent(name) + "/properties";
    props.target = "_blank";
    li.textContent = name + " ";
    li.appendChild(use);
    li.appendChild(document.createTextNode(" "));
    li.appendChild(props);
    list.appendChild(li);
  }
}
document.getElementById("namespace-create").addEventListener("click", async () => {
  const name = document.getElementById("new-namespace-name").value;
  const resp = await fetch("/namespace", {
    method: "POST",
    headers: {"Content-Type": "text/plain"},
    body: "com.bigdata.rdf.sail.namespace=" + name + "\\n",
  });
  document.getElementById("namespace-errors").textContent =
    resp.ok ? "" : await resp.text();
  refreshNamespaces();
});
refreshNamespaces();
</script>
</body>
</html>
"""
