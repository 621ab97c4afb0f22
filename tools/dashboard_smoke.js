#!/usr/bin/env node
// Execute a graft dashboard's embedded JS against a minimal DOM shim and
// assert it renders. Usage: node dashboard_smoke.js <file.html>
// Exercises the exact code a browser would run (pattern dropdown render,
// waterfall SVG, labelling buttons, cluster studio table), so a JS-level
// regression (bad interpolation, missing esc(), null handling) fails CI
// instead of a user's browser.
'use strict';
const fs = require('fs');
const vm = require('vm');

const file = process.argv[2];
const html = fs.readFileSync(file, 'utf8');

function makeElement(tag) {
  const el = {
    tagName: tag,
    children: [],
    listeners: {},
    innerHTML: '',
    textContent: '',
    value: '',
    style: {},
    appendChild(c) { this.children.push(c); return c; },
    addEventListener(ev, fn) {
      (this.listeners[ev] = this.listeners[ev] || []).push(fn);
    },
    fire(ev) { (this.listeners[ev] || []).forEach(fn => fn({target: this})); },
    querySelectorAll() { return []; },
    setAttribute() {},
  };
  return el;
}

// id -> element; JSON islands expose their body via textContent
const byId = {};
const islandRe =
  /<script type="application\/json" id="(\w+)">([\s\S]*?)<\/script>/g;
let m;
while ((m = islandRe.exec(html)) !== null) {
  const el = makeElement('script');
  el.textContent = m[2];
  byId[m[1]] = el;
  JSON.parse(m[2].replace(/<\\\//g, '</')); // island must be valid JSON
}
byId['app'] = makeElement('div');
// any static element carrying an id (e.g. the chart shell's #vis)
for (const dm of html.matchAll(/<(\w+) id="(\w+)">/g)) {
  if (!byId[dm[2]]) byId[dm[2]] = makeElement(dm[1]);
}

const created = [];
const document = {
  getElementById: id => byId[id] || null,
  createElement: tag => { const e = makeElement(tag); created.push(e); return e; },
};

// the inline (non-island) script is the dashboard's behaviour
const scripts = [...html.matchAll(/<script>([\s\S]*?)<\/script>/g)]
  .map(x => x[1]);
if (scripts.length === 0) {
  // chart shells carry no inline JS — islands parsed above is the check
  console.log(`${file}: OK (JSON island only)`);
  process.exit(0);
}

const ctx = vm.createContext({ document, console, JSON, Math, Object });
for (const s of scripts) vm.runInContext(s, ctx, { filename: file });

// drive whatever got built
const app = byId['app'];
const selects = app.children.filter(c => c.tagName === 'select');
for (const sel of selects) sel.fire('change');
const buttons = created.filter(c => c.tagName === 'button');
for (const b of buttons.slice(0, 3)) b.fire('click');

// rendered markup must exist somewhere and carry no unescaped nulls
const allHtml = created.concat(Object.values(byId))
  .map(e => e.innerHTML + e.textContent).join('');
if (!/table|svg|No comparison rows|tr|Vega-Lite spec/.test(allHtml)) {
  console.error(`${file}: nothing rendered`);
  process.exit(1);
}
if (typeof ctx.esc === 'function') {
  const escaped = ctx.esc('<img src=x onerror=alert(1)>"&');
  if (/[<>"]/.test(escaped.replace(/&(lt|gt|quot|amp);/g, ''))) {
    console.error(`${file}: esc() leaves active characters: ${escaped}`);
    process.exit(1);
  }
}
console.log(`${file}: OK (${created.length} elements, ` +
  `${selects.length} selects driven)`);
