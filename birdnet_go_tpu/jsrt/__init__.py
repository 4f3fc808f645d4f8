"""jsrt — a from-scratch ECMAScript interpreter + DOM shim for CI.

Why this exists: the reference ships a Playwright e2e suite
(/root/reference/frontend/tests/e2e) that executes every SPA view in a
real browser and fails on any uncaught page error.  This image has no
browser and no node, so static gates (module graph, i18n literal
detection, scope analysis) were the only line of defense — and a static
gate cannot catch a runtime TypeError inside a view's render path.

jsrt closes that hole: a tree-walking ES2020 interpreter (lexer, Pratt
parser, evaluator, module loader) plus a DOM/fetch/host shim sufficient
to boot the SPA shell (index.html inline module), navigate to every
route, and render each view against the REAL in-process API server.
Any uncaught exception, unresolved await, or fetch of an unregistered
route fails CI with a JS stack trace.

Scope is deliberately the language subset the SPA uses (verified by
inventory): ES modules with named imports/exports, async/await,
arrow functions, destructuring, template literals, spread/rest,
optional chaining, nullish coalescing, for-of/in, try/catch, switch,
labeled statements, regex literals, `class` (methods, accessors,
statics, fields, private #members, extends/super), `function*`
generators (yield/yield*, next/return/throw, lazy for-of) including
generator METHODS in classes and object literals, `async function*` +
`for await…of`, Proxy (get/set/has/deleteProperty/ownKeys traps) +
Reflect, and the Object/Array/String/Number/Math/JSON/Date/Promise/
Map/Set/URLSearchParams/URL/Blob builtins.  Still out (clean syntax
errors): Symbol, tagged templates, static blocks, Proxy apply/
construct traps — the gate in tests/test_frontend.py keeps the SPA
inside this subset.
"""

