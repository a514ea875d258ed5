"""Dashboard e2e over real HTTP: auth gate, CSRF, connection CRUD,
key minting, request links, share landing page (reference
``pkg/view/router.go:44-81`` + ``pkg/connections``)."""

from __future__ import annotations

import json
import re
import urllib.error
import urllib.request

import pytest

from scratchdata_spark.config import Config
from scratchdata_spark.dashboard import (
    VIEW_CONFIG,
    FormError,
    decode_form,
    factory_call,
)
from scratchdata_spark.service import build_app


@pytest.fixture(scope="module")
def app(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dash")
    cfg = Config(api_keys={"local": "default"}, admin_key="admin")
    cfg.sink.max_file_age_seconds = 3600
    a = build_app(spark, cfg, str(root))
    a.server.start()
    yield a
    a.server.stop()


class Client:
    """Cookie-carrying client (urllib keeps none by itself)."""

    def __init__(self, app):
        self.base = f"http://127.0.0.1:{app.port}"
        self.cookies: dict[str, str] = {}

    def req(self, method, path, form: dict | None = None):
        headers = {}
        if self.cookies:
            headers["Cookie"] = "; ".join(
                f"{k}={v}" for k, v in self.cookies.items()
            )
        data = None
        if form is not None:
            data = urllib.parse.urlencode(form).encode()
            headers["Content-Type"] = "application/x-www-form-urlencoded"
        r = urllib.request.Request(
            self.base + path, data=data, method=method, headers=headers
        )
        try:
            with urllib.request.urlopen(r, timeout=60) as resp:
                self._eat_cookies(resp)
                return resp.status, resp.read().decode()
        except urllib.error.HTTPError as e:
            self._eat_cookies(e)
            return e.code, e.read().decode()

    def _eat_cookies(self, resp):
        for sc in resp.headers.get_all("Set-Cookie") or []:
            k, v = sc.split(";", 1)[0].split("=", 1)
            self.cookies[k] = v

    def csrf(self, page_html: str) -> str:
        m = re.search(r"name='csrf_token' value='([0-9a-f]{32})'", page_html)
        assert m, "no csrf token on page"
        return m.group(1)


@pytest.fixture()
def client(app):
    return Client(app)


def test_dashboard_requires_admin(client):
    code, body = client.req("GET", "/dashboard/")
    assert code == 401
    code, body = client.req("GET", "/dashboard/?api_key=local")
    assert code == 401  # tenant key is not admin
    code, body = client.req("GET", "/dashboard/?api_key=admin")
    assert code == 200 and "connections" in body
    # the ?api_key visit started a cookie session: a random expiring
    # token — the admin key itself must never land in a cookie
    sess = client.cookies.get("sd_sess")
    assert sess and sess != "admin" and "admin" not in sess
    assert "sd_key" not in client.cookies
    code, _ = client.req("GET", "/dashboard/connections")
    assert code == 200
    # a forged/unknown session token is rejected
    client.cookies["sd_sess"] = "0" * 32
    code, _ = client.req("GET", "/dashboard/connections")
    assert code == 401
    client.cookies["sd_sess"] = sess


def test_redirect_and_type_chooser(client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new")
    assert code == 200
    for t, vc in VIEW_CONFIG.items():
        assert vc["display"] in body
    code, body = client.req("GET", "/dashboard/connections/new/duckdb")
    assert code == 200 and "MotherDuck Token" in body


def test_csrf_rejected_without_cookie_token(client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "nope", "csrf_token": "f" * 32},
    )
    assert code == 403 and "CSRF" in body


def test_upsert_spark_connection_and_key_roundtrip(app, client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/spark")
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "dash_tenant", "csrf_token": token},
    )
    assert code == 200
    m = re.search(r"class='key'>([0-9a-f-]{36})</p>", body)
    assert m, body
    api_key = m.group(1)
    # the minted key works against the JSON API immediately
    code, body = client.req(
        "POST",
        f"/api/data/insert/dash_t?api_key={api_key}",
    )
    # empty body is a 400, but auth passed (not 401)
    assert code == 400
    # listed in the connections table with a working second key mint
    code, body = client.req("GET", "/dashboard/connections")
    assert "dash_tenant" in body
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/keys",
        {"name": "dash_tenant", "csrf_token": token},
    )
    assert code == 200 and re.search(r"[0-9a-f-]{36}", body)
    # edit page renders the saved form
    code, body = client.req("GET", "/dashboard/connections/edit/dash_tenant")
    assert code == 200 and "dash_tenant" in body


def test_upsert_form_error_rerenders(client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/spark")
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "", "csrf_token": token},
    )
    assert code == 200 and "flash" in body and "Missing name" in body
    # duplicate name is a form error, not a 500
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "default", "csrf_token": token},
    )
    assert code == 200 and "flash" in body


def test_delete_connection_revokes_keys(app, client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/spark")
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "doomed", "csrf_token": token},
    )
    key = re.search(r"class='key'>([0-9a-f-]{36})</p>", body).group(1)
    assert app.service.keys.resolve(key) == "doomed"
    code, body = client.req(
        "POST",
        "/dashboard/connections/delete",
        {"name": "doomed", "csrf_token": token},
    )
    assert code in (200, 302)
    assert "doomed" not in app.service.destinations
    assert app.service.keys.resolve(key) is None


def test_request_link_flow(app, client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections")
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/request",
        {"type": "spark", "csrf_token": token},
    )
    assert code == 200
    rid = re.search(r"/request/([0-9a-f-]{36})", body).group(1)

    # the third party (no admin cookie) opens the link and submits
    outsider = Client(app)
    code, body = outsider.req("GET", f"/request/{rid}")
    assert code == 200 and "Connection Name" in body
    token = outsider.csrf(body)
    code, body = outsider.req(
        "POST",
        "/request/upsert",
        {"request_id": rid, "name": "partner_db", "csrf_token": token},
    )
    assert code in (200, 302)
    assert "partner_db" in app.service.destinations
    # link is one-time: second open 404s
    code, body = outsider.req("GET", f"/request/{rid}")
    assert code == 404
    # success page is public
    code, body = outsider.req("GET", "/request/success")
    assert code == 200


def test_request_link_unknown_or_expired(app, client):
    outsider = Client(app)
    code, _ = outsider.req("GET", f"/request/{'0' * 8}-dead-beef-dead-beefdeadbeef")
    assert code == 404
    # expired row: write one directly with a past expiry
    rid = app.service.dashboard.requests.create("x Request", "spark")
    import sqlite3

    with sqlite3.connect(app.service.dashboard.requests._db_path) as c:
        c.execute(
            "UPDATE connection_requests SET expires = 0 WHERE request_id = ?",
            (rid,),
        )
    code, body = outsider.req("GET", f"/request/{rid}")
    assert code == 404 and "expired" in body


def test_share_landing_page(app, client):
    uid = app.service.shares.create(
        "default", "Monthly revenue", "select 1 as one", 3600
    )
    outsider = Client(app)
    code, body = outsider.req("GET", f"/share/{uid}")
    assert code == 200
    assert "Monthly revenue" in body and "Expires" in body
    assert f"/share/{uid}/data.csv" in body and f"/share/{uid}/data.json" in body
    # the linked data endpoints still work (HTML route must not shadow them)
    code, body = outsider.req("GET", f"/share/{uid}/data.json")
    assert code == 200 and json.loads(body) == [{"one": 1}]
    code, body = outsider.req("GET", f"/share/{'1' * 8}-1111-1111-1111-111111111111")
    assert code == 404


def test_decode_form_types_and_factory_mapping():
    s = decode_form(
        "postgres",
        {"host": "h", "port": "5555", "database": "d", "user": "u",
         "password": "p", "schema": ""},
    )
    assert s["port"] == 5555 and s["schema"] == "public"
    t, fs = factory_call("postgres", s)
    assert t == "jdbc" and fs["url"] == "jdbc:postgresql://h:5555/d"
    # duckdb: token → motherduck, no token → local file
    t, fs = factory_call("duckdb", {"database": "db1", "token": "tok"})
    assert t == "motherduck" and fs == {"database": "db1", "token": "tok"}
    t, fs = factory_call("duckdb", {"database": "/tmp/x.db", "token": ""})
    assert t == "duckdb" and fs == {"path": "/tmp/x.db"}
    # bools + bad number
    s = decode_form("clickhouse", {"tls": "on", "http_port": "8443"})
    assert s["tls"] is True
    with pytest.raises(FormError):
        decode_form("clickhouse", {"http_port": "NaN"})
    with pytest.raises(FormError):
        decode_form("nosuch", {})


# ------------------------- fixes from the round-4 adversarial review


def test_edit_connection_saves_and_keeps_keys(app, client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/spark")
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "editable", "csrf_token": token},
    )
    key = re.search(r"class='key'>([0-9a-f-]{36})</p>", body).group(1)
    # edit page renders with the existing marker, and saving works
    code, body = client.req("GET", "/dashboard/connections/edit/editable")
    assert code == 200 and "name='existing' value='1'" in body
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "editable", "existing": "1",
         "csrf_token": token},
    )
    assert code == 200 and "updated" in body and "shown exactly once" not in body
    # the pre-edit key still resolves — update must not revoke keys
    assert app.service.keys.resolve(key) == "editable"


def test_form_with_api_key_in_url_sets_csrf_cookie(app):
    """A fresh admin session landing DIRECTLY on a form page via
    ?api_key= must still receive the sd_csrf cookie (both Set-Cookie
    headers go out), or the form could never submit."""
    c = Client(app)
    code, body = c.req(
        "GET", "/dashboard/connections/new/spark?api_key=admin"
    )
    assert code == 200
    assert "sd_sess" in c.cookies and "sd_csrf" in c.cookies
    token = c.csrf(body)
    code, body = c.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "direct_entry", "csrf_token": token},
    )
    assert code == 200 and re.search(r"[0-9a-f-]{36}", body)


def test_unknown_type_upsert_renders_error_not_crash(app, client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/spark")
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "bogus", "name": "x", "csrf_token": token},
    )
    assert code == 200 and "Unknown connection type" in body


def test_bad_backend_credentials_rerender_as_flash(app, client):
    """Factory failures raise backend-specific exceptions (duckdb
    IOException etc.), which must surface as the form's flash path,
    not a dropped socket."""
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/duckdb")
    token = client.csrf(body)
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "duckdb", "name": "badduck",
         "database": "/nonexistent-dir/no.db", "token": "",
         "csrf_token": token},
    )
    assert code == 200 and "Failed to connect" in body
    assert "badduck" not in app.service.destinations


def test_index_omits_edit_link_for_non_dashboard_connections(app, client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections")
    # 'default' comes from build-time config — no dashboard form state
    assert "/dashboard/connections/edit/default" not in body


# ----------------------- round-5: static assets + PRG flash messages


def test_static_assets_served(app):
    """Reference mounts a file server at /static/* (router.go:70-72);
    assets are public (no admin gate) and cacheable."""
    c = Client(app)
    base = c.base
    r = urllib.request.urlopen(base + "/static/style.css")
    assert r.status == 200
    assert "text/css" in r.headers["Content-Type"]
    assert "max-age" in r.headers.get("Cache-Control", "")
    assert "font-family" in r.read().decode()
    r = urllib.request.urlopen(base + "/static/app.js")
    assert "javascript" in r.headers["Content-Type"]
    r = urllib.request.urlopen(base + "/static/logo.svg")
    assert "svg" in r.headers["Content-Type"]
    # unknown and traversal-shaped names 404 (no filesystem behind it)
    code, _ = c.req("GET", "/static/nope.css")
    assert code == 404
    code, _ = c.req("GET", "/static/..%2Fconfig")
    assert code == 404
    # pages link the served assets
    code, body = c.req("GET", "/dashboard/?api_key=admin")
    assert "/static/style.css" in body and "/static/app.js" in body


def test_delete_flashes_once_after_redirect(app, client):
    """Deleting a connection is post-redirect-get with a one-shot
    flash (reference session flashes, session/service.go:15-40): the
    followed redirect shows it, a refresh does not."""
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/spark")
    token = client.csrf(body)
    client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "doomed", "csrf_token": token},
    )
    code, body = client.req(
        "POST",
        "/dashboard/connections/delete",
        {"name": "doomed", "csrf_token": token},
    )
    # urllib follows the 302 to the connections index
    assert code == 200
    assert "flash-success" in body and "doomed" in body and "deleted" in body
    # one-shot: the next render has popped it
    code, body = client.req("GET", "/dashboard/connections")
    assert code == 200 and "flash-success" not in body


def test_edit_flash_after_redirect(app, client):
    client.req("GET", "/dashboard/?api_key=admin")
    code, body = client.req("GET", "/dashboard/connections/new/spark")
    token = client.csrf(body)
    client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "flashed", "csrf_token": token},
    )
    code, body = client.req(
        "POST",
        "/dashboard/connections/upsert",
        {"type": "spark", "name": "flashed", "existing": "1",
         "csrf_token": token},
    )
    assert code == 200
    assert "flash-success" in body and "keys keep working" in body


# ---------------------------------------------- OAuth login seam (r6)


class _FakeProvider:
    """Same two-method surface as dashboard.OAuthProvider, no network
    — exchange() validates the code the way a provider would."""

    def __init__(self, email="admin@example.com"):
        self.email = email
        self.seen = []

    def authorize_url(self, state, redirect_uri):
        return f"https://fake.example/auth?state={state}&redirect_uri={redirect_uri}"

    def exchange(self, code, redirect_uri):
        self.seen.append((code, redirect_uri))
        if code != "good-code":
            raise ValueError("bad code")
        return {"email": self.email, "sub": "123"}


def _no_redirect(client, path):
    """GET without following redirects (urllib follows by default and
    drops intermediate Set-Cookie headers)."""
    import urllib.request

    class NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(NoRedirect)
    headers = {}
    if client.cookies:
        headers["Cookie"] = "; ".join(
            f"{k}={v}" for k, v in client.cookies.items()
        )
    req = urllib.request.Request(client.base + path, headers=headers)
    try:
        resp = opener.open(req, timeout=60)
    except urllib.error.HTTPError as e:
        resp = e
    for sc in resp.headers.get_all("Set-Cookie") or []:
        k, v = sc.split(";", 1)[0].split("=", 1)
        client.cookies[k] = v
    return resp.status, resp.headers, resp.read().decode()


def test_oauth_login_callback_session_and_logout(app):
    """reference router.go:74-76: /login lists the provider, the
    callback exchanges the code and mints the same server-side
    session an api-key login gets, /logout invalidates it."""
    dash = app.service.dashboard
    prov = _FakeProvider()
    dash.oauth_providers = {"google": prov}
    dash.oauth_allowed_emails = {"Admin@Example.com"}  # case-insensitive
    c = Client(app)

    # /login page lists the provider link with a minted state
    status, body = c.req("GET", "/login")
    assert status == 200 and "Sign in with google" in body
    m = re.search(r"state=([0-9a-f]{32})", body)
    assert m, body
    state = m.group(1)

    # callback with the state + good code -> 302 to /dashboard/ with a
    # session cookie; the session passes the admin gate with NO api_key
    status, headers, _ = _no_redirect(
        c, f"/oauth/google/callback?state={state}&code=good-code"
    )
    assert status == 302 and headers["Location"] == "/dashboard/"
    assert "sd_sess" in c.cookies
    assert prov.seen and prov.seen[0][0] == "good-code"
    status, body = c.req("GET", "/dashboard/connections")
    assert status == 200 and "Connections" in body
    # identity recorded against the session token
    assert dash._session_identity[c.cookies["sd_sess"]] == "admin@example.com"

    # /logout kills the session server-side and expires the cookie
    status, headers, _ = _no_redirect(c, "/logout")
    assert status == 302 and headers["Location"] == "/login"
    assert c.cookies.get("sd_sess") == ""
    c.cookies.pop("sd_sess", None)
    status, _ = c.req("GET", "/dashboard/connections")
    assert status == 401


def test_oauth_callback_refusals(app):
    """State is single-use and provider-bound; identities outside the
    allowlist never get the admin session; a failed exchange is a 403
    not a 500; unknown providers 404."""
    dash = app.service.dashboard
    prov = _FakeProvider()
    dash.oauth_providers = {"google": prov}
    dash.oauth_allowed_emails = {"admin@example.com"}
    c = Client(app)

    # unknown provider
    status, _, _ = _no_redirect(c, "/oauth/github/callback?state=x&code=y")
    assert status == 404

    # forged / unknown state
    status, _, _ = _no_redirect(
        c, "/oauth/google/callback?state=" + "0" * 32 + "&code=good-code"
    )
    assert status == 403

    # state is single-use: second replay with the same state fails
    _, body = c.req("GET", "/login")
    state = re.search(r"state=([0-9a-f]{32})", body).group(1)
    status, _, _ = _no_redirect(
        c, f"/oauth/google/callback?state={state}&code=good-code"
    )
    assert status == 302
    status, _, _ = _no_redirect(
        c, f"/oauth/google/callback?state={state}&code=good-code"
    )
    assert status == 403

    # bad code -> exchange raises -> 403
    _, body = c.req("GET", "/login")
    state = re.search(r"state=([0-9a-f]{32})", body).group(1)
    status, _, _ = _no_redirect(
        c, f"/oauth/google/callback?state={state}&code=evil"
    )
    assert status == 403

    # authenticated but not allowlisted -> refused (single-tenant
    # admin dashboard; see Dashboard.__init__ divergence note)
    dash.oauth_allowed_emails = {"someone-else@example.com"}
    _, body = c.req("GET", "/login")
    state = re.search(r"state=([0-9a-f]{32})", body).group(1)
    fresh = Client(app)
    status, _, _ = _no_redirect(
        fresh, f"/oauth/google/callback?state={state}&code=good-code"
    )
    assert status == 403
    assert "sd_sess" not in fresh.cookies

    # and with NO allowlist at all, OAuth can't mint admin sessions
    dash.oauth_allowed_emails = None
    _, body = c.req("GET", "/login")
    state = re.search(r"state=([0-9a-f]{32})", body).group(1)
    status, _, _ = _no_redirect(
        fresh, f"/oauth/google/callback?state={state}&code=good-code"
    )
    assert status == 403
