// Differential harness: runs the REFERENCE sanitize() (extracted verbatim
// from /root/reference/src/iframe.js) under Node with a minimal DOM shim,
// so recrun_spark/render.py can be fuzzed against the reference CODE, not
// against hand-pinned expectations (ADVICE r03 item 1).
//
// The shim implements only what sanitize() touches: DOMParser
// .parseFromString('text/html') over WELL-FORMED input (the engine's own
// serializer output shape — no tag-soup error recovery), Node type
// constants, Element/Text nodes with tagName/attributes/childNodes/
// textContent/appendChild/setAttribute, document.createElement/
// createTextNode, and the global WHATWG URL (built into Node, the same
// implementation browsers use).  Browser attribute semantics are kept:
// duplicate attribute names keep the FIRST occurrence; setAttribute
// overwrites in place.
//
// stdin:  JSONL {html, baseURI, tags: [..], attrs: {tag: [..]}}
// stdout: JSONL {out: <serialized sanitized fragment>}
// Serialization matches render.py's _serialize: lowercase tags, attributes
// in insertion order, text escapes &<>, attr escapes &", void tags open.

'use strict';

const fs = require('fs');
const path = require('path');

const IFRAME_JS = '/root/reference/src/iframe.js';

const VOID = new Set(['area', 'base', 'br', 'col', 'embed', 'hr', 'img',
                      'input', 'link', 'meta', 'param', 'source', 'track',
                      'wbr']);

const NAMED_ENTITIES = {amp: '&', lt: '<', gt: '>', quot: '"',
                        apos: "'", nbsp: ' '};

function decodeEntities(s) {
    return s.replace(/&(#x[0-9a-fA-F]+|#[0-9]+|[a-zA-Z][a-zA-Z0-9]*);/g,
        (m, body) => {
            if (body[0] === '#') {
                const code = body[1] === 'x' || body[1] === 'X'
                    ? parseInt(body.slice(2), 16) : parseInt(body.slice(1), 10);
                return Number.isFinite(code) ? String.fromCodePoint(code) : m;
            }
            return Object.prototype.hasOwnProperty.call(NAMED_ENTITIES, body)
                ? NAMED_ENTITIES[body] : m;
        });
}

const NodeShim = {TEXT_NODE: 3, ELEMENT_NODE: 1};

class TextNode {
    constructor(text) {
        this.nodeType = NodeShim.TEXT_NODE;
        this.textContent = text;
    }
}

class Element {
    constructor(tag, doc) {
        this.nodeType = NodeShim.ELEMENT_NODE;
        this.tagName = tag.toUpperCase();   // HTML docs report uppercase
        this._tag = tag.toLowerCase();
        this.attributes = [];               // [{name, value}] document order
        this.childNodes = [];
        this.ownerDocument = doc;
    }
    appendChild(n) { this.childNodes.push(n); return n; }
    setAttribute(name, value) {
        name = String(name).toLowerCase();
        const hit = this.attributes.find((a) => a.name === name);
        if (hit) hit.value = String(value);
        else this.attributes.push({name, value: String(value)});
    }
    _addParsedAttr(name, value) {   // parser rule: FIRST occurrence wins
        name = name.toLowerCase();
        if (!this.attributes.some((a) => a.name === name)) {
            this.attributes.push({name, value});
        }
    }
}

class DocumentShim {
    createElement(tag) { return new Element(tag, this); }
    createTextNode(text) { return new TextNode(String(text)); }
}

// -- minimal well-formed HTML parser ---------------------------------------

function parseFragment(s, doc) {
    const root = new Element('body', doc);
    const stack = [root];
    let i = 0;
    const n = s.length;
    const appendText = (raw) => {
        if (raw.length) {
            stack[stack.length - 1].appendChild(
                new TextNode(decodeEntities(raw)));
        }
    };
    while (i < n) {
        if (s[i] === '<') {
            let m;
            if ((m = /^<\/([a-zA-Z][^\s>]*)\s*>/.exec(s.slice(i)))) {
                const tag = m[1].toLowerCase();
                for (let j = stack.length - 1; j >= 1; j--) {
                    if (stack[j]._tag === tag) { stack.length = j; break; }
                }
                i += m[0].length;
                continue;
            }
            if ((m = /^<([a-zA-Z][^\s/>]*)/.exec(s.slice(i)))) {
                const el = new Element(m[1], doc);
                let j = i + m[0].length;
                for (;;) {
                    while (j < n && /\s/.test(s[j])) j++;
                    if (j >= n) break;
                    if (s[j] === '/') { j++; continue; }
                    if (s[j] === '>') { j++; break; }
                    const am = /^[^\s=/>]+/.exec(s.slice(j));
                    if (!am) { j++; continue; }
                    const name = am[0];
                    j += am[0].length;
                    let k = j;
                    while (k < n && /\s/.test(s[k])) k++;
                    let val = '';
                    if (s[k] === '=') {
                        k++;
                        while (k < n && /\s/.test(s[k])) k++;
                        const q = s[k];
                        if (q === '"' || q === "'") {
                            const end = s.indexOf(q, k + 1);
                            val = s.slice(k + 1, end === -1 ? n : end);
                            k = end === -1 ? n : end + 1;
                        } else {
                            const vm = /^[^\s>]*/.exec(s.slice(k));
                            val = vm[0];
                            k += vm[0].length;
                        }
                        j = k;
                    }
                    el._addParsedAttr(name, decodeEntities(val));
                }
                stack[stack.length - 1].appendChild(el);
                if (el._tag === 'script' || el._tag === 'style') {
                    // rawtext elements: content is NOT markup and NOT
                    // entity-decoded (browser + html.parser CDATA mode)
                    const close = new RegExp(`</${el._tag}\\s*>`, 'i');
                    const m2 = close.exec(s.slice(j));
                    const end2 = m2 ? j + m2.index : n;
                    if (end2 > j) {
                        el.appendChild(new TextNode(s.slice(j, end2)));
                    }
                    i = m2 ? end2 + m2[0].length : n;
                    continue;
                }
                if (!VOID.has(el._tag)) stack.push(el);
                i = j;
                continue;
            }
        }
        const next = s.indexOf('<', i + 1);
        const end = s[i] === '<'
            ? (next === -1 ? n : next)
            : (s.indexOf('<', i) === -1 ? n : s.indexOf('<', i));
        appendText(s.slice(i, end));
        i = end;
    }
    return root;
}

class DOMParserShim {
    parseFromString(html, _mime) {
        const doc = new DocumentShim();
        return {body: parseFragment(String(html || ''), doc)};
    }
}

// -- serializer (mirrors render.py _serialize) ------------------------------

function escText(s) {
    return s.replace(/&/g, '&amp;').replace(/</g, '&lt;').replace(/>/g, '&gt;');
}
function escAttr(s) {
    return s.replace(/&/g, '&amp;').replace(/"/g, '&quot;');
}

function serialize(node, out) {
    for (const ch of node.childNodes) {
        if (ch.nodeType === NodeShim.TEXT_NODE) {
            out.push(escText(ch.textContent));
            continue;
        }
        out.push('<' + ch._tag);
        for (const a of ch.attributes) {
            out.push(` ${a.name}="${escAttr(a.value)}"`);
        }
        out.push('>');
        if (!VOID.has(ch._tag)) {
            serialize(ch, out);
            out.push(`</${ch._tag}>`);
        }
    }
}

// -- load the reference sanitize() VERBATIM ---------------------------------

function loadReferenceSanitize() {
    const src = fs.readFileSync(IFRAME_JS, 'utf8');
    const start = src.indexOf('const sanitize = function(');
    if (start === -1) throw new Error('sanitize not found in iframe.js');
    const end = src.indexOf('\n};', start);
    if (end === -1) throw new Error('sanitize end not found');
    const fnSrc = src.slice(start, end + 3);
    // evaluate with the shim DOM bound; 'sanitize' is the only binding
    // eslint-disable-next-line no-new-func
    const factory = new Function('DOMParser', 'Node', 'URL',
        `${fnSrc}\nreturn sanitize;`);
    return factory(DOMParserShim, NodeShim, URL);
}

function main() {
    const sanitize = loadReferenceSanitize();
    const lines = fs.readFileSync(0, 'utf8').split('\n').filter(Boolean);
    const out = [];
    for (const line of lines) {
        const c = JSON.parse(line);
        const doc = new DocumentShim();
        const root = new Element('div', doc);
        const allowedTags = new Set(c.tags);
        const allowedAttrs = new Map(
            Object.entries(c.attrs).map(([t, as]) => [t, new Set(as)]));
        sanitize(c.html, root, allowedTags, allowedAttrs, c.baseURI);
        const parts = [];
        serialize(root, parts);
        out.push(JSON.stringify({out: parts.join('')}));
    }
    process.stdout.write(out.join('\n') + '\n');
}

main();
