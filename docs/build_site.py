#!/usr/bin/env python
"""Static documentation-site builder (the reference ships Sphinx/RTD —
/root/reference/docs/conf.py, .readthedocs.yaml; this repo's counterpart
builds a browsable HTML site from the markdown guides plus an API
reference generated from the package's docstrings).

Sphinx/mkdocs are not installable in this environment, so the site is
built with the stock ``markdown`` package (fenced code, tables, TOC,
Pygments highlighting) and a small Jinja2 template — zero new
dependencies. Output is self-contained static HTML.

Usage:
    python docs/build_site.py [output_dir]     # default docs/_site
    make -C docs html                          # same thing

The API reference imports ``colvarsfinder_tpu`` (forcing the CPU
platform so building docs never claims the TPU chip) and walks the
public surface module by module: exported classes with their public
methods, functions with signatures, and the raw docstrings rendered
preformatted (they are written as plain text with light RST math, which
reads fine verbatim).
"""

from __future__ import annotations

import html
import inspect
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# guides in nav order: (source path relative to repo root, page title)
PAGES = [
    ("README.md", "Overview"),
    ("docs/tutorial.md", "Tutorial"),
    ("docs/math.md", "Math & loss spec"),
    ("docs/api.md", "API guide & migration map"),
    ("docs/design.md", "Design decisions"),
    ("docs/performance.md", "Performance guide"),
    ("docs/validation.md", "Validating a CV"),
    ("docs/parity_checklist.md", "Parity checklist"),
    ("benchmarks/RESULTS.md", "Benchmark results"),
    ("CHANGELOG.md", "Changelog"),
]

# modules documented in the generated API reference, in order
API_MODULES = [
    "colvarsfinder_tpu",
    "colvarsfinder_tpu.core",
    "colvarsfinder_tpu.models",
    "colvarsfinder_tpu.ops",
    "colvarsfinder_tpu.utils",
    "colvarsfinder_tpu.parallel",
    "colvarsfinder_tpu.analysis",
    "colvarsfinder_tpu.workflow",
    "colvarsfinder_tpu.plotting",
    "colvarsfinder_tpu.checkpoint",
    "colvarsfinder_tpu.export",
    "colvarsfinder_tpu.deploy",
    "colvarsfinder_tpu.deploy_native",
    "colvarsfinder_tpu.deploy_torch",
    "colvarsfinder_tpu.deploy_plumed",
    "colvarsfinder_tpu.tune",
    "colvarsfinder_tpu.config",
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{{ title }} — colvarsfinder-tpu</title>
<style>
:root { --fg: #1a1a1a; --bg: #ffffff; --accent: #0b5d8a; --line: #e3e3e3; }
* { box-sizing: border-box; }
body { margin: 0; font: 15px/1.55 -apple-system, "Segoe UI", Roboto,
       Helvetica, Arial, sans-serif; color: var(--fg); background: var(--bg); }
nav { position: fixed; top: 0; left: 0; bottom: 0; width: 240px;
      overflow-y: auto; border-right: 1px solid var(--line);
      padding: 18px 14px; background: #fafafa; }
nav h1 { font-size: 15px; margin: 0 0 12px; }
nav a { display: block; color: var(--fg); text-decoration: none;
        padding: 4px 8px; border-radius: 5px; font-size: 13.5px; }
nav a:hover { background: #eef4f8; }
nav a.current { background: var(--accent); color: #fff; }
main { margin-left: 240px; padding: 28px 40px 80px;
       max-width: 960px; }
h1, h2, h3, h4 { line-height: 1.25; }
h2 { border-bottom: 1px solid var(--line); padding-bottom: 4px; }
a { color: var(--accent); }
code { background: #f4f4f4; padding: 1px 4px; border-radius: 4px;
       font-size: 90%; }
pre { background: #f7f7f7; border: 1px solid var(--line); padding: 10px
      14px; overflow-x: auto; border-radius: 6px; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 12px 0; }
th, td { border: 1px solid var(--line); padding: 5px 10px;
         text-align: left; vertical-align: top; }
th { background: #f4f4f4; }
.docstring { background: #fbfbfb; border-left: 3px solid var(--accent);
             padding: 8px 14px; white-space: pre-wrap;
             font-size: 13.5px; margin: 6px 0 18px; }
.sig { font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
       font-size: 13.5px; background: #eef4f8; padding: 6px 10px;
       border-radius: 6px; display: block; margin-top: 16px; }
.api-kind { color: #777; font-size: 12px; text-transform: uppercase;
            letter-spacing: 0.06em; }
{{ pygments_css }}
</style>
</head>
<body>
<nav>
<h1>colvarsfinder-tpu</h1>
{% for href, name, current in nav %}
<a href="{{ href }}"{% if current %} class="current"{% endif %}>{{ name }}</a>
{% endfor %}
</nav>
<main>
{{ body }}
</main>
</body>
</html>
"""


def _md():
    import markdown

    return markdown.Markdown(
        extensions=["fenced_code", "tables", "toc", "codehilite"],
        extension_configs={
            "codehilite": {"guess_lang": False, "noclasses": False}
        },
    )


def _pygments_css():
    try:
        from pygments.formatters import HtmlFormatter

        return HtmlFormatter().get_style_defs(".codehilite")
    except Exception:  # pragma: no cover
        return ""


def _slug(path: str) -> str:
    base = os.path.basename(path)
    return os.path.splitext(base)[0].lower() + ".html"


def _rewrite_links(html_text: str, known: dict) -> str:
    """Point intra-repo markdown links at their rendered pages."""
    for src, target in known.items():
        for prefix in ("", "../", "./", "docs/", "../docs/",
                       "benchmarks/", "../benchmarks/"):
            html_text = html_text.replace(
                f'href="{prefix}{os.path.basename(src)}"',
                f'href="{target}"',
            )
    return html_text


def _api_entries(mod):
    """(kind, name, signature, doc) for a module's public surface."""
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for name in names:
        obj = getattr(mod, name, None)
        if obj is None or inspect.ismodule(obj):
            continue
        # only document objects defined inside the package
        obj_mod = getattr(obj, "__module__", "") or ""
        if not obj_mod.startswith("colvarsfinder_tpu"):
            continue
        try:
            sig = str(inspect.signature(obj))
        except (TypeError, ValueError):
            sig = ""
        doc = inspect.getdoc(obj) or ""
        kind = "class" if inspect.isclass(obj) else "function"
        methods = []
        if inspect.isclass(obj):
            for mname, m in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(m):
                    continue
                try:
                    msig = str(inspect.signature(m))
                except (TypeError, ValueError):
                    msig = "(...)"
                mdoc = inspect.getdoc(m) or ""
                methods.append((mname, msig, mdoc))
        out.append((kind, name, sig, doc, methods))
    return out


def _render_api() -> str:
    import importlib

    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:  # never claim the TPU chip from a docs build
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - backend already initialized
        pass

    parts = ["<h1>API reference</h1>",
             "<p>Generated from the package docstrings "
             "(<code>python docs/build_site.py</code>).</p>"]
    for modname in API_MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as e:  # pragma: no cover
            parts.append(
                f"<h2>{modname}</h2><p><em>import failed: "
                f"{html.escape(repr(e))}</em></p>"
            )
            continue
        anchor = modname.replace(".", "-")
        parts.append(f'<h2 id="{anchor}"><code>{modname}</code></h2>')
        mdoc = inspect.getdoc(mod)
        if mdoc:
            first = mdoc.split("\n\n", 1)[0]
            parts.append(
                f'<p>{html.escape(first)}</p>'
            )
        for kind, name, sig, doc, methods in _api_entries(mod):
            parts.append(
                f'<span class="api-kind">{kind}</span>'
                f'<span class="sig" id="{anchor}-{name}">'
                f"<b>{html.escape(name)}</b>{html.escape(sig)}</span>"
            )
            if doc:
                parts.append(
                    f'<div class="docstring">{html.escape(doc)}</div>'
                )
            for mname, msig, mdoc_ in methods:
                parts.append(
                    f'<span class="sig" style="margin-left:24px">'
                    f".{html.escape(mname)}{html.escape(msig)}</span>"
                )
                if mdoc_:
                    first = mdoc_.split("\n\n", 1)[0]
                    parts.append(
                        f'<div class="docstring" style="margin-left:24px">'
                        f"{html.escape(first)}</div>"
                    )
    return "\n".join(parts)


def build(out_dir: str) -> list:
    from jinja2 import Template

    os.makedirs(out_dir, exist_ok=True)
    tpl = Template(TEMPLATE)
    css = _pygments_css()

    targets = {src: _slug(src) for src, _ in PAGES}
    targets["README.md"] = "index.html"
    nav_items = [(targets[src], title) for src, title in PAGES]
    nav_items.append(("apiref.html", "API reference"))

    written = []

    def emit(out_name, title, body):
        nav = [(href, name, href == out_name) for href, name in nav_items]
        page = tpl.render(
            title=title, body=body, nav=nav, pygments_css=css
        )
        path = os.path.join(out_dir, out_name)
        with open(path, "w") as f:
            f.write(page)
        written.append(path)

    for src, title in PAGES:
        src_path = os.path.join(ROOT, src)
        if not os.path.exists(src_path):  # pragma: no cover
            continue
        md = _md()
        body = md.convert(open(src_path).read())
        body = _rewrite_links(body, targets)
        emit(targets[src], title, body)

    emit("apiref.html", "API reference", _render_api())
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "_site")
    files = build(out)
    print(f"built {len(files)} pages -> {out}")
