/*
 * Node oracle harness: runs the REFERENCE readabilitySAX verbatim over
 * span-encoded documents and dumps golden extractions (SURVEY.md §5.1,
 * FIXTURES.md §3).
 *
 * Usage: node oracle.js <input.jsonl> <output.jsonl>
 *   input lines:  {"doc_id": ..., "config": "shipped"|"full",
 *                  "spans": [[kind,text,media_ref,offset], ...],
 *                  "page_url": optional}
 *   output lines: {"doc_id", "config", "title", "next_page", "text_length",
 *                  "score", "retained_spans": [[kind,text,media_ref,offset]]}
 *
 * The reference module is re-required per document (require.cache cleared)
 * so module-global regex state (re_commas lastIndex, R:213) starts fresh for
 * each doc — mirroring the Python port's per-extract reset.
 *
 * NOTE: the `title` ATTRIBUTE is reserved to carry each element's span
 * offset (survives both cleanAttributes settings, R:168; behaviorally inert
 * otherwise).  Do not name local bindings `text`/`txt` (accidental globals
 * at R:42/R:123).
 */
'use strict';
const fs = require('fs');

const REF = '/root/reference/src/lib/readabilitySAX/readabilitySAX.js';
global.Node = { TEXT_NODE: 3, ELEMENT_NODE: 1 };

const MEDIA = new Set(['img', 'embed', 'iframe', 'object', 'video', 'audio']);

function parseMediaRef(ref) {
    const hash = ref.indexOf('#');
    if (hash === -1) return [ref, null, null];
    const url = ref.slice(0, hash), frag = ref.slice(hash + 1);
    const mw = /w=([0-9]+)/.exec(frag), mh = /h=([0-9]+)/.exec(frag);
    return [url, mw ? mw[1] : null, mh ? mh[1] : null];
}

function buildDom(spans) {
    const root = { nodeType: 1, tagName: 'ROOT', attributes: [], childNodes: [] };
    const stack = [root];
    let cur = root;
    for (const [kind, payload, mediaRef, offset] of spans) {
        if (kind === 'text') {
            cur.childNodes.push({ nodeType: 3, textContent: payload, dataOffset: offset });
        } else if (kind.startsWith('open:')) {
            const tag = kind.slice(5);
            const el = {
                nodeType: 1, tagName: tag,
                attributes: [{ name: 'title', value: String(offset) }],
                childNodes: [],
            };
            if (MEDIA.has(tag) && mediaRef) {
                const [url, w, h] = parseMediaRef(mediaRef);
                if (url) el.attributes.push({ name: 'src', value: url });
                if (w !== null) el.attributes.push({ name: 'width', value: w });
                if (h !== null) el.attributes.push({ name: 'height', value: h });
            }
            cur.childNodes.push(el);
            stack.push(el);
            cur = el;
        } else if (kind.startsWith('attr:')) {
            cur.attributes.push({ name: kind.slice(5), value: payload });
        } else if (kind.startsWith('close:')) {
            stack.pop();
            cur = stack[stack.length - 1];
        } else {
            throw new Error('unknown span kind: ' + kind);
        }
    }
    if (root.childNodes.length !== 1) {
        throw new Error('expected exactly one root element, got ' + root.childNodes.length);
    }
    return root.childNodes[0];
}

// Ordered retained-span walk — must mirror recrun_spark.readability.collect_retained
function collectRetained(el, out) {
    for (const ch of el.children) {
        if (ch.nodeType === Node.TEXT_NODE) {
            if (ch.textContent.length > 0) {
                out.push(['text', ch.textContent, '', ch.dataOffset]);
            }
        } else if (MEDIA.has(ch.name)) {
            out.push([ch.name, '', ch.attributes.src || '',
                      parseInt(ch.attributes['title'], 10)]);
        } else {
            collectRetained(ch, out);
        }
    }
}

function extractDoc(rec) {
    delete require.cache[require.resolve(REF)]; // fresh module-global regex state
    const Readability = require(REF);

    const dom = buildDom(rec.spans);
    let settings, skipLevel;
    if (rec.config === 'full') {
        settings = {};          // library defaults (all heuristics on, R:230-242)
        skipLevel = 0;
    } else {
        settings = { cleanAttributes: false };  // content.js:151-153
        skipLevel = 3;
    }
    if (rec.page_url) settings.pageURL = rec.page_url;

    const readable = new Readability({ documentElement: dom }, settings, skipLevel);
    const article = readable.getArticle(false);
    // _getCandidateNode() re-run is safe: _topCandidate memoized; when null,
    // getTopCandidate re-runs but mutates nothing (no candidates exist).
    const cand = readable._getCandidateNode();
    const retained = [];
    collectRetained(cand, retained);
    // the synthetic `title` offset attributes must not leak into the HTML
    // rendering (scores are already computed; deletion is inert otherwise)
    (function stripTitles(el) {
        if (el.attributes) delete el.attributes['title'];
        if (el.children) {
            for (const ch of el.children) {
                if (ch.nodeType !== Node.TEXT_NODE) stripTitles(ch);
            }
        }
    })(cand);
    return {
        doc_id: rec.doc_id,
        config: rec.config,
        title: article.title,
        next_page: article.nextPage,
        text_length: article.textLength,
        score: article.score,
        retained_spans: retained,
        text: readable.getText(cand),
        html: readable.getHTML(cand),
    };
}

function main() {
    const [inPath, outPath] = process.argv.slice(2);
    const lines = fs.readFileSync(inPath, 'utf8').split('\n').filter(Boolean);
    const out = [];
    for (const line of lines) {
        out.push(JSON.stringify(extractDoc(JSON.parse(line))));
    }
    fs.writeFileSync(outPath, out.join('\n') + '\n');
}

main();
