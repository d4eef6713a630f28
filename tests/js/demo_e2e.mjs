// Executes the SHIPPED demo page script (voxtral_tpu/serving/static/
// index.html) in Node against a live voxtral server, driving the real
// capture->resample->/stream pipeline via the page's own
// window.__voxtral.driveSynthetic() hook.  The analogue of the
// reference's Playwright E2E (tests/e2e_browser.spec.ts:38-116) for a
// server-side deployment: no WebGPU needed, only fetch + the page JS.
//
// Usage: node demo_e2e.mjs <server_base_url> <index.html path> [seconds]
// Prints one JSON line {sent16k, tokens, text} on success.

import { readFileSync } from "fs";

const [, , base, htmlPath, seconds = "4"] = process.argv;
if (!base || !htmlPath) {
  console.error("usage: node demo_e2e.mjs <base_url> <index.html> [s]");
  process.exit(2);
}

const html = readFileSync(htmlPath, "utf8");
const m = html.match(/<script>([\s\S]*)<\/script>/);
if (!m) {
  console.error("no <script> block found in page");
  process.exit(1);
}

// --- DOM shims (only what the page touches at top level) ---------------
const elements = new Map();
const el = (id) => {
  if (!elements.has(id))
    elements.set(id, {
      textContent: "",
      innerHTML: "",
      disabled: false,
      style: {},
      onclick: null,
      onchange: null,
      files: [],
      click() {},
    });
  return elements.get(id);
};
globalThis.document = { getElementById: el };
globalThis.window = globalThis;

// Relative fetch paths -> the live server.
const realFetch = globalThis.fetch;
globalThis.fetch = (path, opts) =>
  realFetch(path.startsWith("http") ? path : base + path, opts);

// --- run the shipped script verbatim -----------------------------------
new Function(m[1])();

if (!globalThis.window.__voxtral?.driveSynthetic) {
  console.error("page script did not install window.__voxtral");
  process.exit(1);
}

const res = await globalThis.window.__voxtral.driveSynthetic(
  Number(seconds),
  48000,
);
console.log(JSON.stringify(res));
const expect16k = Number(seconds) * 16000;
if (!(res.sent16k > 0.9 * expect16k && res.sent16k <= expect16k)) {
  console.error(`bad sent16k ${res.sent16k} (expect ~${expect16k})`);
  process.exit(1);
}
if (!(res.tokens > 0)) {
  console.error(`no tokens decoded: ${res.tokens}`);
  process.exit(1);
}
