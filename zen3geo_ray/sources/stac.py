"""Live STAC API client — pagination/limit against a real endpoint.

The reference searches STAC APIs through pystac-client
(``/root/reference/zen3geo/datapipes/pystac_client.py:127-135`` —
``ItemSearch`` with ``max_items``/paging — and ``:228-233`` —
``ItemLister`` over a collection); the repo's manifest tables covered
the DATAFLOW but not the client.  This is the client: stdlib-urllib
against any STAC API (tested against a local fixture server), feeding
the same ``manifest_from_items`` tables the rest of the engine
consumes.

Implements the STAC API paging contract:

* each page is a GeoJSON FeatureCollection with ``features`` and
  ``links``;
* the ``rel="next"`` link carries the follow-up request — plain
  ``href`` for GET, and for POST optionally ``body`` (+ ``merge``:
  combine with the original body) per the STAC API spec;
* ``limit`` is the page-size REQUEST (servers may clamp),
  ``max_items`` caps the total yielded across pages.

The driver fetches pages (item lists are small by contract — assets
are what's heavy, and those read distributed via the manifest); a
missing ``next`` link ends iteration, and a paging loop is bounded to
guard against servers that link to themselves.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

_MAX_PAGES = 10_000


def _req_json(url: str, body: dict | None = None) -> dict:
    if body is None:
        req = urllib.request.Request(url)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _next_link(page: dict):
    for ln in page.get("links", []):
        if ln.get("rel") == "next":
            return ln
    return None


def stac_search(api_url: str, *, collections=None, bbox=None,
                datetime: str | None = None, limit: int = 100,
                max_items: int | None = None,
                method: str = "POST") -> list[dict]:
    """POST (default) or GET ``{api}/search`` and follow ``next``
    links until exhausted or ``max_items`` yielded.  Returns the raw
    item dicts (GeoJSON Features) in server order."""
    base = api_url.rstrip("/") + "/search"
    items: list[dict] = []
    if method.upper() == "POST":
        body: dict = {"limit": limit}
        if collections:
            body["collections"] = list(collections)
        if bbox is not None:
            body["bbox"] = list(bbox)
        if datetime is not None:
            body["datetime"] = datetime
        url = base
        for _ in range(_MAX_PAGES):
            page = _req_json(url, body)
            items.extend(page.get("features", []))
            if max_items is not None and len(items) >= max_items:
                return items[:max_items]
            nxt = _next_link(page)
            if nxt is None:
                break
            url = nxt.get("href", base)
            nbody = nxt.get("body")
            if nbody is not None:
                body = {**body, **nbody} if nxt.get("merge") else nbody
            # else: re-POST the same body at the new href
        return items
    # GET flavor: querystring params, next.href is self-contained
    params = {"limit": str(limit)}
    if collections:
        params["collections"] = ",".join(collections)
    if bbox is not None:
        params["bbox"] = ",".join(str(float(v)) for v in bbox)
    if datetime is not None:
        params["datetime"] = datetime
    url = base + "?" + urllib.parse.urlencode(params)
    for _ in range(_MAX_PAGES):
        page = _req_json(url)
        items.extend(page.get("features", []))
        if max_items is not None and len(items) >= max_items:
            return items[:max_items]
        nxt = _next_link(page)
        if nxt is None or "href" not in nxt:
            break
        url = nxt["href"]
    return items


def stac_collection_items(api_url: str, collection: str, *,
                          limit: int = 100,
                          max_items: int | None = None) -> list[dict]:
    """GET ``{api}/collections/{id}/items`` with next-link pagination
    (the ``PySTACAPIItemLister`` analog, ``pystac_client.py:228-233``)."""
    url = (api_url.rstrip("/") + f"/collections/{collection}/items"
           + "?" + urllib.parse.urlencode({"limit": str(limit)}))
    items: list[dict] = []
    for _ in range(_MAX_PAGES):
        page = _req_json(url)
        items.extend(page.get("features", []))
        if max_items is not None and len(items) >= max_items:
            return items[:max_items]
        nxt = _next_link(page)
        if nxt is None or "href" not in nxt:
            break
        url = nxt["href"]
    return items


def items_to_manifest_records(items: list[dict],
                              asset_key: str | None = None) -> list[dict]:
    """STAC Feature dicts -> the plain manifest records
    ``manifest_from_items`` takes (uri, bbox, ts, props).  ``asset_key``
    picks the asset (default: first by sorted key)."""
    out = []
    for it in items:
        assets = it.get("assets", {})
        if asset_key is not None:
            uri = assets[asset_key]["href"]
        elif assets:
            uri = assets[sorted(assets)[0]]["href"]
        else:
            uri = it.get("id", "")
        props = it.get("properties", {})
        ts = props.get("datetime")
        if isinstance(ts, str) and ts.endswith("Z"):
            ts = ts[:-1]  # np.datetime64 takes naive-UTC strings
        out.append({
            "uri": uri,
            "bbox": list(it.get("bbox", [0.0, 0.0, 0.0, 0.0])),
            "ts": ts,
            "props": props,
        })
    return out


def search_items_manifest(api_url: str, **kwargs):
    """One-call surface: live search -> Ray manifest Dataset (the
    ``PySTACAPISearcher`` end-to-end analog)."""
    from .readers import manifest_from_items

    asset_key = kwargs.pop("asset_key", None)
    items = stac_search(api_url, **kwargs)
    return manifest_from_items(
        items_to_manifest_records(items, asset_key=asset_key))
