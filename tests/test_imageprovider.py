"""Imageprovider: Wikipedia + Avicommons chain, DB cache, negative caching
(reference: internal/imageprovider/)."""

import json

from birdnet_go_tpu.datastore.sqlite import Datastore
from birdnet_go_tpu.integrations.imageprovider import (
    AvicommonsProvider,
    ImageProviderService,
    WikipediaProvider,
)

WIKI_JSON = {
    "query": {"pages": {"123": {
        "title": "Turdus merula",
        "thumbnail": {"source": "https://upload.example/t/merula-320.jpg"},
        "original": {"source": "https://upload.example/merula.jpg"},
    }}}
}


class _FakeResp:
    def __init__(self, payload, status=200):
        self._payload = payload
        self.status_code = status

    def json(self):
        return self._payload

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"http {self.status_code}")


class _FakeSession:
    def __init__(self, payload):
        self.payload = payload
        self.calls = 0

    def get(self, url, params=None):
        self.calls += 1
        return _FakeResp(self.payload)


def test_wikipedia_provider_parses_pageimages():
    sess = _FakeSession(WIKI_JSON)
    p = WikipediaProvider(session=sess, rate_per_second=1000)
    info = p.fetch("Turdus merula")
    assert info.url == "https://upload.example/merula.jpg"
    assert info.thumbnail_url.endswith("merula-320.jpg")
    assert info.provider == "wikimedia"


def test_avicommons_static_urls():
    p = AvicommonsProvider()
    p.load_dataset(json.dumps([
        {"code": "eurbla", "name": "Eurasian Blackbird",
         "sciName": "Turdus merula", "license": "cc-by-nc",
         "key": "12345678", "by": "Jane Doe"}]))
    info = p.fetch("TURDUS MERULA")
    assert info.url == "https://static.avicommons.org/eurbla-12345678-320.jpg"
    assert info.author == "Jane Doe"
    assert p.fetch("Parus major") is None


def test_service_chain_db_cache_and_negative_cache(tmp_path):
    ds = Datastore(tmp_path / "img.db")
    sess = _FakeSession(WIKI_JSON)
    wiki = WikipediaProvider(session=sess, rate_per_second=1000)
    now = [1000.0]
    svc = ImageProviderService([wiki], datastore=ds, clock=lambda: now[0])

    info = svc.get_image("Turdus merula")
    assert info.url.endswith("merula.jpg") and sess.calls == 1
    # memory + DB cache: no further network
    assert svc.get_image("Turdus merula").url == info.url
    assert sess.calls == 1
    # a FRESH service (restart) hits the DB cache, not the network
    svc2 = ImageProviderService([wiki], datastore=ds, clock=lambda: now[0])
    assert svc2.get_image("turdus MERULA").url == info.url
    assert sess.calls == 1

    # negative caching: an absent species queries once, then is remembered
    sess.payload = {"query": {"pages": {"-1": {"missing": ""}}}}
    assert svc.get_image("Nullus avis") is None
    assert sess.calls == 2
    assert svc.get_image("Nullus avis") is None
    assert sess.calls == 2
    assert svc.negative_hits == 1
    # negative entries expire after the TTL
    now[0] += 25 * 3600
    sess.payload = WIKI_JSON
    assert svc.get_image("Nullus avis") is not None
    assert sess.calls == 3
    ds.close()


def test_provider_failure_falls_through_chain():
    class _Boom:
        name = "boom"

        def fetch(self, s):
            raise RuntimeError("down")

    avi = AvicommonsProvider()
    avi.load_dataset(json.dumps([
        {"code": "grtit1", "sciName": "Parus major", "key": "k", "by": "x",
         "license": "cc0", "name": "Great Tit"}]))
    svc = ImageProviderService([_Boom(), avi])
    assert svc.get_image("Parus major").provider == "avicommons"
