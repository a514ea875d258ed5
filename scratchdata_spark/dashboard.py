"""Server-rendered dashboard: connection management + share pages.

The last reference surface this repo had skipped — ``pkg/view/*`` +
``pkg/connections/*`` (~950 LoC of Go/templ).  Parity map:

  route table                 ``pkg/view/router.go:44-81``
  page handlers               ``pkg/view/controller.go``
  form flow / upsert          ``pkg/connections/service.go`` + ``upsert.go``
  per-type form fields        the ``form:`` struct tags on each
                              destination config (``duckdb/duckdb.go:21``,
                              ``postgres/postgres.go:14-19``,
                              ``redshift/redshift.go:14-27``,
                              ``bigquery/bigquery.go:14-21``,
                              ``clickhouse/clickhouse.go:21-28``) read by
                              ``pkg/util/forms.go:ConvertToForms``
  request links (7-day TTL)   ``pkg/storage/database/gorm/gorm.go:76-84``
  share landing page          ``pkg/view/templates/pages/share.html``

Routes:
  GET  /dashboard[/]                   home
  GET  /dashboard/connections          list connections
  GET  /dashboard/connections/new      type chooser
  GET  /dashboard/connections/new/{t}  credential form for type t
  POST /dashboard/connections/upsert   validate + create + show API key
  POST /dashboard/connections/keys     mint a key for a connection
  GET  /dashboard/connections/edit/{name}
  POST /dashboard/connections/delete
  POST /dashboard/connections/request  create a one-time setup link
  GET  /request/{id}                   third-party credential form
  POST /request/upsert                 third-party submit
  GET  /request/success
  GET  /share/{uuid}                   public share landing (HTML)

Dashboard routes are gated on the admin API key (the reference wraps
them in its auth middleware); ``/request/*`` and ``/share/{uuid}``
are public, exactly like the reference.  POSTs carry a double-submit
CSRF token (the reference uses gorilla/csrf).  Everything is stdlib:
pages are f-string HTML with ``html.escape`` on all user data — no
web framework or template engine exists in this environment.
"""

from __future__ import annotations

import html
import re
import secrets
import sqlite3
import threading
import time
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone
from urllib.parse import parse_qs

REQUEST_TTL_SECONDS = 7 * 24 * 3600  # gorm.go:82 — time.Hour * 24 * 7


@dataclass(frozen=True)
class FormField:
    """One rendered form input — ``pkg/util/forms.go:8-13``."""

    name: str
    type: str  # text | password | number | bool | textarea
    label: str
    default: str = ""


# Per-type credential forms — the reference's ViewConfig
# (``pkg/destinations/config.go:11-35``) plus this repo's native
# "spark" warehouse type. Field names/labels/defaults mirror the Go
# struct tags line-for-line so a reference user sees the same form.
VIEW_CONFIG: dict[str, dict] = {
    "spark": {
        "display": "Spark Warehouse",
        "fields": [],  # native: settings come from the server config
    },
    "duckdb": {
        "display": "DuckDB",
        "fields": [
            FormField("database", "text", "Database Name"),
            FormField("token", "password", "MotherDuck Token"),
        ],
    },
    "postgres": {
        "display": "PostgreSQL",
        "fields": [
            FormField("host", "text", "Host"),
            FormField("port", "number", "Port", "5432"),
            FormField("database", "text", "Database"),
            FormField("user", "text", "User"),
            FormField("password", "password", "Password"),
            FormField("schema", "text", "Schema", "public"),
        ],
    },
    "redshift": {
        "display": "Redshift",
        "fields": [
            FormField("redshift_host", "text", "Host"),
            FormField("redshift_port", "number", "Port", "5439"),
            FormField("redshift_database", "text", "Database"),
            FormField("redshift_user", "text", "User"),
            FormField("redshift_password", "password", "Password"),
            FormField("redshift_schema", "text", "Schema", "public"),
            FormField("s3_region", "text", "S3 Region"),
            FormField("s3_access_key_id", "text", "S3 Access Key ID"),
            FormField("s3_secret_access_key", "password", "S3 Secret Access Key"),
            FormField("s3_bucket", "text", "S3 Bucket"),
            FormField("s3_file_prefix", "text", "S3 File Prefix"),
            FormField("delete_from_s3", "bool", "Delete From S3"),
        ],
    },
    "bigquery": {
        "display": "BigQuery",
        "fields": [
            FormField("credentials_json", "textarea", "Credentials JSON String"),
            FormField("location", "text", "Location"),
            FormField("gcs_bucket_name", "text", "GCS Bucket Name"),
            FormField("gcs_file_prefix", "text", "GCS File Prefix"),
            FormField("delete_from_gcs", "bool", "Delete From GCS"),
        ],
    },
    "clickhouse": {
        "display": "Clickhouse",
        "fields": [
            FormField("host", "text", "Host"),
            FormField("username", "text", "Username"),
            FormField("password", "password", "Password"),
            FormField("database", "text", "Database Name", "default"),
            FormField("http_protocol", "text", "HTTP Protocol", "https"),
            FormField("http_port", "number", "HTTP Port", "8443"),
            FormField("tcp_port", "number", "TCP Port", "9440"),
            FormField("tls", "bool", "TLS"),
        ],
    },
}


class FormError(Exception):
    """``pkg/connections/upsert.go:33-41`` — a user-facing validation
    failure that re-renders the form with a flash, not a 500."""

    def __init__(self, title: str, message: str):
        super().__init__(f"{title}: {message}")
        self.title = title
        self.message = message


class OAuthProvider:
    """External-identity provider for the dashboard login flow — the
    last unported reference route set (``pkg/api/router.go:74-76``:
    GET /login, /logout, /oauth/{provider}/callback;
    ``pkg/api/auth.go:146-193`` OAuthCallback does code → token →
    userinfo → session cookie).

    This class IS the network seam: ``exchange()`` performs the
    authorization-code dance over urllib against the configured
    endpoints. The sandbox has no network, so tests inject an object
    with the same two-method surface; a real deployment instantiates
    this with the provider's published endpoints (e.g. Google's
    accounts.google.com/o/oauth2/v2/auth + oauth2.googleapis.com/token
    + openidconnect.googleapis.com/v1/userinfo).
    """

    def __init__(
        self,
        name: str,
        client_id: str,
        client_secret: str,
        auth_url: str,
        token_url: str,
        userinfo_url: str,
        scope: str = "openid email",
        timeout: float = 10.0,
    ):
        self.name = name
        self.client_id = client_id
        self.client_secret = client_secret
        self.auth_url = auth_url
        self.token_url = token_url
        self.userinfo_url = userinfo_url
        self.scope = scope
        # exchange() runs inside an HTTP handler thread — a provider
        # that accepts the connection and stalls must not hang it
        self.timeout = timeout

    def authorize_url(self, state: str, redirect_uri: str) -> str:
        from urllib.parse import urlencode

        return self.auth_url + "?" + urlencode(
            {
                "client_id": self.client_id,
                "redirect_uri": redirect_uri,
                "response_type": "code",
                "scope": self.scope,
                "state": state,
            }
        )

    def exchange(self, code: str, redirect_uri: str) -> dict:
        """Authorization code → token → userinfo claims (dict with at
        least ``email``). Network happens HERE and only here."""
        import json as _json
        from urllib.parse import urlencode
        from urllib.request import Request, urlopen

        body = urlencode(
            {
                "code": code,
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "redirect_uri": redirect_uri,
                "grant_type": "authorization_code",
            }
        ).encode()
        with urlopen(
            Request(self.token_url, data=body), timeout=self.timeout
        ) as resp:
            token = _json.loads(resp.read()).get("access_token", "")
        req = Request(
            self.userinfo_url,
            headers={"Authorization": f"Bearer {token}"},
        )
        with urlopen(req, timeout=self.timeout) as resp:
            return _json.loads(resp.read())


class RequestStore:
    """One-time connection-setup links, sqlite-backed like the other
    metadata stores (reference keeps them in its gorm DB —
    ``gorm.go:76-84``). Expired rows are treated as absent."""

    def __init__(self, db_path: str):
        self._db_path = db_path
        self._lock = threading.Lock()
        with self._conn() as c:
            c.execute(
                "CREATE TABLE IF NOT EXISTS connection_requests ("
                " request_id TEXT PRIMARY KEY, dest_name TEXT, dest_type TEXT,"
                " expires REAL)"
            )

    def _conn(self) -> sqlite3.Connection:
        return sqlite3.connect(self._db_path, timeout=30)

    def create(self, dest_name: str, dest_type: str) -> str:
        rid = str(uuid.uuid4())
        with self._lock, self._conn() as c:
            c.execute(
                "INSERT INTO connection_requests VALUES (?,?,?,?)",
                (rid, dest_name, dest_type, time.time() + REQUEST_TTL_SECONDS),
            )
        return rid

    def get(self, rid: str) -> tuple[str, str] | None:
        """(dest_name, dest_type) or None — expired links report
        'request expired' upstream (``connections/service.go:229``)."""
        with self._conn() as c:
            row = c.execute(
                "SELECT dest_name, dest_type, expires FROM connection_requests"
                " WHERE request_id = ?",
                (rid,),
            ).fetchone()
        if row is None or row[2] < time.time():
            return None
        return row[0], row[1]

    def delete(self, rid: str) -> None:
        with self._lock, self._conn() as c:
            c.execute(
                "DELETE FROM connection_requests WHERE request_id = ?", (rid,)
            )


def decode_form(dest_type: str, form: dict[str, str]) -> dict:
    """Typed settings from a posted form — the reference does this
    with gorilla/schema + mapstructure over the config struct
    (``upsert.go:86-97``); here the FormField type drives the cast."""
    vc = VIEW_CONFIG.get(dest_type)
    if vc is None:
        raise FormError("Unknown connection type", dest_type)
    settings: dict = {}
    for f in vc["fields"]:
        raw = form.get(f.name, "") or f.default
        if f.type == "number":
            try:
                settings[f.name] = int(raw) if raw else 0
            except ValueError:
                raise FormError(
                    "Failed to decode form", f"{f.label}: not a number: {raw!r}"
                ) from None
        elif f.type == "bool":
            settings[f.name] = str(raw).lower() in ("on", "true", "1", "yes")
        else:
            settings[f.name] = raw
    return settings


def factory_call(dest_type: str, settings: dict) -> tuple[str, dict]:
    """Map a dashboard form to this repo's destination_factory
    vocabulary (service.py).  DuckDB with a token becomes MotherDuck —
    the same branch the reference takes at ``duckdb/duckdb.go:58-68``;
    the JDBC engines build their connection URL here."""
    if dest_type == "spark":
        return "spark", {}
    if dest_type == "duckdb":
        if settings.get("token"):
            return "motherduck", {
                "database": settings.get("database", ""),
                "token": settings["token"],
            }
        return "duckdb", {"path": settings.get("database") or ":memory:"}
    if dest_type == "postgres":
        url = (
            f"jdbc:postgresql://{settings.get('host', '')}:"
            f"{settings.get('port', 5432)}/{settings.get('database', '')}"
        )
        return "jdbc", {
            "url": url,
            "engine": "postgres",
            "user": settings.get("user"),
            "password": settings.get("password"),
        }
    if dest_type == "redshift":
        url = (
            f"jdbc:redshift://{settings.get('redshift_host', '')}:"
            f"{settings.get('redshift_port', 5439)}/"
            f"{settings.get('redshift_database', '')}"
        )
        return "jdbc", {
            "url": url,
            "engine": "redshift",
            "user": settings.get("redshift_user"),
            "password": settings.get("redshift_password"),
        }
    if dest_type == "clickhouse":
        proto = settings.get("http_protocol", "https")
        url = (
            f"jdbc:clickhouse:{proto}://{settings.get('host', '')}:"
            f"{settings.get('http_port', 8443)}/{settings.get('database', 'default')}"
        )
        return "jdbc", {
            "url": url,
            "engine": "clickhouse",
            "user": settings.get("username"),
            "password": settings.get("password"),
        }
    if dest_type == "bigquery":
        return "bigquery", {
            "gcs_bucket": settings.get("gcs_bucket_name", ""),
            "gcs_prefix": settings.get("gcs_file_prefix", ""),
            "delete_from_gcs": settings.get("delete_from_gcs", True),
            "credentials_json": settings.get("credentials_json", ""),
            "location": settings.get("location", ""),
        }
    raise FormError("Unknown connection type", dest_type)


_e = html.escape

_CSS = """
body{font-family:system-ui,sans-serif;margin:0;background:#f6f7f9;color:#111}
main{max-width:44rem;margin:3rem auto;background:#fff;padding:2rem;
 border-radius:.5rem;box-shadow:0 1px 3px rgba(0,0,0,.12)}
h1{font-size:1.5rem} a{color:#4f46e5}
table{border-collapse:collapse;width:100%} td,th{padding:.4rem .6rem;
 border-bottom:1px solid #e5e7eb;text-align:left}
label{display:block;margin:.6rem 0 .2rem;font-weight:600;font-size:.85rem}
input[type=text],input[type=password],input[type=number],textarea{
 width:100%;padding:.4rem;border:1px solid #d1d5db;border-radius:.25rem}
button{margin-top:1rem;background:#4f46e5;color:#fff;border:0;
 padding:.5rem 1rem;border-radius:.25rem;cursor:pointer}
.flash{background:#fef2f2;border:1px solid #fecaca;color:#991b1b;
 padding:.6rem 1rem;border-radius:.25rem;margin-bottom:1rem}
.flash-success{background:#f0fdf4;border-color:#bbf7d0;color:#166534}
.flash-warning{background:#fffbeb;border-color:#fde68a;color:#92400e}
.kw{color:#4f46e5;font-weight:600}
.key{font-family:monospace;background:#f3f4f6;padding:.4rem .6rem;
 border-radius:.25rem;display:inline-block}
.inline{display:inline}
"""


# Embedded static assets, served at /static/* (reference mounts a
# FileServer over pkg/view/static at router.go:70-72 — highlight.js,
# CSS, logos; here the assets are original: the stylesheet, a small
# dependency-free SQL keyword highlighter for query text, and an SVG
# logo). Public like the reference's fileServer; immutable-cacheable.
_APP_JS = """// Minimal SQL keyword highlighter for <pre data-sql> / .sql blocks.
(function () {
  var KW = ("select from where group by order having join left right" +
    " full inner outer on as insert into values update set delete" +
    " create table view drop limit offset union all distinct case" +
    " when then else end and or not null is in exists between like" +
    " with copy to pivot unpivot qualify asof").split(" ");
  var re = new RegExp("\\b(" + KW.join("|") + ")\\b", "gi");
  function esc(t) {
    return t.replace(/&/g, "&amp;").replace(/</g, "&lt;");
  }
  document.querySelectorAll("pre[data-sql], .sql").forEach(function (el) {
    el.innerHTML = esc(el.textContent).replace(re, function (m) {
      return "<span class='kw'>" + m + "</span>";
    });
  });
})();
"""

_LOGO_SVG = """<svg xmlns='http://www.w3.org/2000/svg' viewBox='0 0 64 64' width='64'>
  <rect width='64' height='64' rx='12' fill='#4f46e5'/>
  <path d='M14 40 L26 22 L38 34 L50 16' stroke='#fff' stroke-width='5'
        fill='none' stroke-linecap='round' stroke-linejoin='round'/>
  <circle cx='50' cy='16' r='4' fill='#fff'/>
</svg>
"""

_STATIC = {
    "style.css": ("text/css; charset=utf-8", _CSS),
    "app.js": ("application/javascript; charset=utf-8", _APP_JS),
    "logo.svg": ("image/svg+xml", _LOGO_SVG),
}


def _page(title: str, body: str) -> str:
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_e(title)}</title>"
        "<link rel='icon' href='/static/logo.svg'>"
        "<link rel='stylesheet' href='/static/style.css'>"
        "<script src='/static/app.js' defer></script></head>"
        f"<body><main>{body}</main></body></html>"
    )


class Dashboard:
    """HTML controller over the API `Service` — holds no query state;
    every mutation goes through the same Service methods the JSON API
    uses, so dashboard- and API-created connections are identical."""

    def __init__(
        self,
        service,
        meta_db: str,
        external_url: str = "",
        secure_cookies: bool = False,
        session_ttl: float = 12 * 3600,
        oauth_providers: dict[str, OAuthProvider] | None = None,
        oauth_allowed_emails: set[str] | None = None,
    ):
        self.service = service
        self.requests = RequestStore(meta_db)
        self.external_url = external_url.rstrip("/")
        # OAuth login: provider registry + the email allowlist that
        # gates it. DIVERGENCE from the reference, on purpose: the
        # reference's callback CreateUsers ANY authenticated Google
        # identity (auth.go:172) because its dashboard is per-user;
        # this dashboard is single-tenant ADMIN, so an OAuth login
        # mints an admin session — without an explicit allowlist that
        # would hand admin to anyone with a Google account, so the
        # callback refuses unless the email is allowlisted.
        self.oauth_providers = oauth_providers or {}
        self.oauth_allowed_emails = oauth_allowed_emails
        # single-use CSRF states for the authorize redirect:
        # state -> (provider, expiry)
        self._oauth_states: dict[str, tuple[str, float]] = {}
        # session token -> external identity (email) for OAuth logins
        self._session_identity: dict[str, str] = {}
        # admin browser sessions: random server-side tokens, never the
        # API key itself — a ?api_key= URL lands in browser history and
        # proxy logs, so the credential must not also live for the
        # browser's lifetime in a cookie
        self._sessions: dict[str, float] = {}
        self.session_ttl = session_ttl
        self.secure_cookies = secure_cookies  # set behind TLS
        # settings shown on the edit page; password-typed fields are
        # never stored here so they can't leak back into HTML
        self.dest_settings: dict[str, dict] = {}
        self.dest_dashboard_type: dict[str, str] = {}
        # post-redirect-get flash messages (the reference's
        # gorilla-session flashes, pkg/view/session/service.go:15-40):
        # queued server-side per browser session, popped on next
        # render; timestamped so never-rendered entries (client gone,
        # session expired) are swept instead of accumulating forever
        self._flashes: dict[str, list[tuple[float, str, str, str]]] = {}

    # ------------------------------------------------------------ http
    def _send(
        self,
        handler,
        code: int,
        body: str,
        set_cookie: str | list[str] | None = None,
    ):
        payload = body.encode()
        handler.send_response(code)
        handler.send_header("Content-Type", "text/html; charset=utf-8")
        handler.send_header("Content-Length", str(len(payload)))
        cookies = (
            [set_cookie] if isinstance(set_cookie, str) else (set_cookie or [])
        )
        for c in cookies:
            if c:
                handler.send_header("Set-Cookie", c)
        handler.end_headers()
        handler.wfile.write(payload)
        handler._resp_bytes = len(payload)

    def _redirect(self, handler, location: str, set_cookie: str | None = None):
        handler.send_response(302)
        handler.send_header("Location", location)
        if set_cookie:
            handler.send_header("Set-Cookie", set_cookie)
        handler.send_header("Content-Length", "0")
        handler.end_headers()

    def _cookies(self, handler) -> dict[str, str]:
        out: dict[str, str] = {}
        for part in handler.headers.get("Cookie", "").split(";"):
            if "=" in part:
                k, v = part.split("=", 1)
                out[k.strip()] = v.strip()
        return out

    def _is_admin(self, handler, params) -> bool:
        key = params.get("api_key")
        if key:
            return self.service.keys.is_admin(key)
        tok = self._cookies(handler).get("sd_sess")
        if not tok:
            return False
        exp = self._sessions.get(tok)
        if exp is None or exp < time.time():
            self._sessions.pop(tok, None)
            self._session_identity.pop(tok, None)
            return False
        return True

    def _session_cookie(self) -> str:
        """Exchange a presented admin key for a random session token
        (expiring, HttpOnly, Secure behind TLS) — the cookie never
        carries the key."""
        now = time.time()
        self._sessions = {t: e for t, e in self._sessions.items() if e > now}
        self._session_identity = {
            t: i for t, i in self._session_identity.items()
            if t in self._sessions
        }
        tok = secrets.token_hex(16)
        self._sessions[tok] = now + self.session_ttl
        c = (
            f"sd_sess={tok}; HttpOnly; SameSite=Strict; Path=/;"
            f" Max-Age={int(self.session_ttl)}"
        )
        if self.secure_cookies:
            c += "; Secure"
        return c

    # ----------------------------------------------------- oauth login
    def _login_page(self, handler):
        """GET /login (reference router.go:74): provider links, each
        carrying a freshly minted single-use state; plus the api-key
        path that always works."""
        now = time.time()
        self._oauth_states = {
            s: pe for s, pe in self._oauth_states.items() if pe[1] > now
        }
        # /login is pre-auth by design, so the state dict must be
        # size-bounded or a request flood grows it without limit for
        # the whole 10-minute TTL: past the cap, evict oldest-expiry
        # first (an evicted state just means that login restarts)
        if len(self._oauth_states) >= 4096:
            keep = sorted(
                self._oauth_states.items(), key=lambda kv: kv[1][1]
            )[-2048:]
            self._oauth_states = dict(keep)
        links = []
        for name, prov in sorted(self.oauth_providers.items()):
            state = secrets.token_hex(16)
            self._oauth_states[state] = (name, now + 600)
            uri = f"{self.external_url}/oauth/{name}/callback"
            links.append(
                f"<li><a href='{html.escape(prov.authorize_url(state, uri))}'>"
                f"Sign in with {html.escape(name)}</a></li>"
            )
        body = "<h1>Sign in</h1>"
        if links:
            body += "<ul>" + "".join(links) + "</ul>"
        body += (
            "<p>Or open any <code>/dashboard/</code> page with"
            " <code>?api_key=&lt;admin key&gt;</code>.</p>"
        )
        self._send(handler, 200, _page("Sign in", body))

    def _oauth_callback(self, handler, provider_name: str, params: dict):
        """GET /oauth/{provider}/callback (reference auth.go:146-193):
        validate the single-use state, exchange the code through the
        provider seam, allowlist-gate the identity, mint the same
        server-side session an api-key login gets."""
        prov = self.oauth_providers.get(provider_name)
        if prov is None:
            self._send(handler, 404, _page("Unknown provider", "<h1>404</h1>"))
            return
        state = params.get("state", "")
        entry = self._oauth_states.pop(state, None)  # single-use
        if (
            entry is None
            or entry[0] != provider_name
            or entry[1] < time.time()
        ):
            self._send(
                handler, 403,
                _page("Login failed", "<h1>403</h1><p>invalid or expired"
                      " state — restart from /login</p>"),
            )
            return
        uri = f"{self.external_url}/oauth/{provider_name}/callback"
        try:
            claims = prov.exchange(params.get("code", ""), uri)
        except Exception:
            self._send(
                handler, 403,
                _page("Login failed", "<h1>403</h1><p>code exchange"
                      " failed</p>"),
            )
            return
        email = str(claims.get("email", "")).strip().lower()
        allowed = {e.lower() for e in (self.oauth_allowed_emails or set())}
        if not email or email not in allowed:
            # see __init__: no allowlist -> nobody logs in via OAuth;
            # an authenticated-but-unlisted identity is refused, never
            # granted the single-tenant admin session
            self._send(
                handler, 403,
                _page("Login failed", "<h1>403</h1><p>identity not"
                      " allowlisted for this dashboard</p>"),
            )
            return
        cookie = self._session_cookie()
        tok = cookie.split("sd_sess=", 1)[1].split(";", 1)[0]
        self._session_identity[tok] = email
        self._redirect(handler, "/dashboard/", set_cookie=cookie)

    def _flash_key(self, handler) -> str | None:
        c = self._cookies(handler)
        return c.get("sd_sess") or c.get("sd_csrf")

    def _flash_add(self, handler, ftype: str, title: str, message: str = ""):
        now = time.time()
        # sweep abandoned queues (flash older than 1h = the client
        # never came back for it) so the dict stays bounded
        for k in list(self._flashes):
            kept = [f for f in self._flashes[k] if f[0] > now - 3600]
            if kept:
                self._flashes[k] = kept
            else:
                del self._flashes[k]
        key = self._flash_key(handler)
        if key is not None:
            self._flashes.setdefault(key, []).append(
                (now, ftype, title, message)
            )

    def _flash_html(self, handler) -> str:
        """Pop this browser session's queued flashes as HTML."""
        key = self._flash_key(handler)
        out = []
        for _ts, ftype, title, message in (
            self._flashes.pop(key, []) if key else []
        ):
            out.append(
                f"<div class='flash flash-{_e(ftype)}'><strong>{_e(title)}"
                f"</strong> {_e(message)}</div>"
            )
        return "".join(out)

    def _csrf_token(self, handler) -> tuple[str, str | None]:
        """Double-submit cookie: (token, Set-Cookie header or None)."""
        tok = self._cookies(handler).get("sd_csrf")
        if tok and re.fullmatch(r"[0-9a-f]{32}", tok):
            return tok, None
        tok = secrets.token_hex(16)
        return tok, f"sd_csrf={tok}; HttpOnly; SameSite=Strict; Path=/"

    def _csrf_ok(self, handler, form: dict[str, str]) -> bool:
        cookie_tok = self._cookies(handler).get("sd_csrf")
        form_tok = form.get("csrf_token")
        return bool(
            cookie_tok
            and form_tok
            and secrets.compare_digest(cookie_tok, form_tok)
        )

    # --------------------------------------------------------- helpers
    def _form_html(
        self,
        dest_type: str,
        action: str,
        token: str,
        *,
        name: str = "",
        values: dict | None = None,
        request_id: str = "",
        flash: str = "",
        existing: bool = False,
    ) -> str:
        # unknown type (hand-edited POST): generic error page, not a
        # KeyError that kills the handler thread mid-response
        vc = VIEW_CONFIG.get(dest_type)
        if vc is None:
            return (
                f"<h1>Unknown connection type</h1>"
                f"<div class='flash'>{_e(flash or dest_type)}</div>"
                "<p><a href='/dashboard/connections/new'>Pick a type</a></p>"
            )
        values = values or {}
        name_ro = " readonly" if existing else ""
        rows = [
            f"<label>Connection Name</label>"
            f"<input type='text' name='name' value='{_e(name)}' required{name_ro}>"
        ]
        for f in vc["fields"]:
            val = str(values.get(f.name, f.default))
            if f.type == "bool":
                checked = " checked" if str(val).lower() in ("on", "true", "1") else ""
                rows.append(
                    f"<label>{_e(f.label)}</label>"
                    f"<input type='checkbox' name='{_e(f.name)}'{checked}>"
                )
            elif f.type == "textarea":
                rows.append(
                    f"<label>{_e(f.label)}</label>"
                    f"<textarea name='{_e(f.name)}' rows='6'>{_e(val)}</textarea>"
                )
            else:
                # passwords are never echoed back into the page
                shown = "" if f.type == "password" else val
                rows.append(
                    f"<label>{_e(f.label)}</label>"
                    f"<input type='{f.type if f.type != 'number' else 'number'}'"
                    f" name='{_e(f.name)}' value='{_e(shown)}'>"
                )
        flash_html = f"<div class='flash'>{_e(flash)}</div>" if flash else ""
        hidden_req = (
            f"<input type='hidden' name='request_id' value='{_e(request_id)}'>"
            if request_id
            else ""
        )
        hidden_existing = (
            "<input type='hidden' name='existing' value='1'>" if existing else ""
        )
        verb = "Edit" if existing else "New"
        return (
            f"<h1>{verb} {_e(vc['display'])} Connection</h1>{flash_html}"
            f"<form method='post' action='{_e(action)}'>"
            f"<input type='hidden' name='type' value='{_e(dest_type)}'>"
            f"<input type='hidden' name='csrf_token' value='{_e(token)}'>"
            f"{hidden_req}{hidden_existing}{''.join(rows)}"
            "<button type='submit'>Save Connection</button></form>"
        )

    def _api_key_page(self, name: str, api_key: str) -> str:
        """pages/connections/api.html — the one place the plaintext
        key is ever shown."""
        url = self.external_url or "this server"
        return (
            f"<h1>Connection “{_e(name)}” ready</h1>"
            "<p>Store this API key now — it is shown exactly once:</p>"
            f"<p class='key'>{_e(api_key)}</p>"
            f"<p>Send data to <span class='key'>{_e(url)}"
            "/api/data/insert/&lt;table&gt;?api_key=…</span></p>"
            "<p><a href='/dashboard/connections'>Back to connections</a></p>"
        )

    def _upsert(self, form: dict[str, str], *, name_override: str | None = None):
        """Shared create/update path for dashboard + request-link
        submits — ``pkg/connections/upsert.go:60-126``: decode, test
        credentials (our factory connects eagerly), create or (when
        the edit form set ``existing``) replace the destination.
        Creates mint one key; updates keep the existing keys valid.
        Any factory failure — bad credentials raise backend-specific
        exceptions (duckdb.Error, JDBC/Py4J), not just ValueError —
        re-renders the form as a flash, never a dropped socket."""
        dest_type = form.get("type", "")
        name = (name_override or form.get("name", "")).strip()
        is_update = form.get("existing") == "1"
        if not name:
            raise FormError("Missing name", "connection name is required")
        settings = decode_form(dest_type, form)
        fac_type, fac_settings = factory_call(dest_type, settings)
        try:
            if is_update:
                self.service.update_destination(name, fac_type, fac_settings)
            else:
                self.service.create_destination(name, fac_type, fac_settings)
        except FormError:
            raise
        except Exception as err:
            raise FormError(
                "Failed to connect to destination."
                " Check the settings and try again.",
                str(err),
            ) from err
        api_key = None if is_update else self.service.create_key(name)
        self.dest_settings[name] = {
            k: v
            for k, v in settings.items()
            if not any(
                f.name == k and f.type == "password"
                for f in VIEW_CONFIG[dest_type]["fields"]
            )
        }
        self.dest_dashboard_type[name] = dest_type
        return name, api_key

    # ------------------------------------------------------------- GET
    def handle_get(self, handler, path: str, params: dict) -> bool:
        """True if the path belonged to the dashboard."""
        if path == "/dashboard":
            self._redirect(handler, "/dashboard/")
            return True

        if path.startswith("/static/"):
            # exact-name lookup in the embedded dict — no filesystem
            # behind this route, so traversal shapes can only 404
            asset = _STATIC.get(path.removeprefix("/static/"))
            if asset is None:
                self._send(handler, 404, _page("Not found", "<h1>404</h1>"))
                return True
            ctype, body = asset
            payload = body.encode()
            handler.send_response(200)
            handler.send_header("Content-Type", ctype)
            handler.send_header("Content-Length", str(len(payload)))
            handler.send_header("Cache-Control", "public, max-age=86400")
            handler.end_headers()
            handler.wfile.write(payload)
            handler._resp_bytes = len(payload)
            return True

        if path == "/login":
            self._login_page(handler)
            return True
        if path == "/logout":
            # reference Logout (auth.go:137-144): invalidate and
            # expire the session, bounce to /login
            tok = self._cookies(handler).get("sd_sess")
            if tok:
                self._sessions.pop(tok, None)
                self._session_identity.pop(tok, None)
            gone = "sd_sess=; HttpOnly; SameSite=Strict; Path=/; Max-Age=0"
            self._redirect(handler, "/login", set_cookie=gone)
            return True
        m = re.fullmatch(r"/oauth/([A-Za-z0-9_-]+)/callback", path)
        if m:
            self._oauth_callback(handler, m.group(1), params)
            return True

        m = re.fullmatch(r"/share/([0-9a-f-]+)", path)
        if m:
            self._share_page(handler, m.group(1))
            return True

        m = re.fullmatch(r"/request/([0-9a-f-]+)", path)
        if m:
            self._request_form(handler, m.group(1))
            return True
        if path == "/request/success":
            self._send(
                handler,
                200,
                _page(
                    "Connection created",
                    "<h1>Connection created</h1>"
                    "<p>Credentials saved. You can close this page.</p>",
                ),
            )
            return True

        if not path.startswith("/dashboard/"):
            return False

        if not self._is_admin(handler, params):
            self._send(
                handler,
                401,
                _page("Unauthorized", "<h1>401</h1><p>admin key required"
                      " (?api_key=…)</p>"),
            )
            return True
        # ?api_key=<admin> on any dashboard page starts a cookie
        # session — a random expiring token, never the key itself
        cookie = None
        if params.get("api_key"):
            cookie = self._session_cookie()

        if path == "/dashboard/":
            body = (
                "<h1>Ready to get your data moving?</h1>"
                "<p>Connect your data sources with"
                " <a href='/dashboard/connections'>connections</a>.</p>"
            )
            self._send(handler, 200, _page("Dashboard", body), cookie)
            return True

        if path == "/dashboard/connections":
            self._connections_index(handler, cookie)
            return True

        if path == "/dashboard/connections/new":
            items = "".join(
                f"<li><a href='/dashboard/connections/new/{t}'>"
                f"{_e(vc['display'])}</a></li>"
                for t, vc in sorted(VIEW_CONFIG.items())
            )
            self._send(
                handler,
                200,
                _page("New Connection", f"<h1>New Connection</h1><ul>{items}</ul>"),
                cookie,
            )
            return True

        m = re.fullmatch(r"/dashboard/connections/new/([a-z]+)", path)
        if m:
            t = m.group(1)
            if t not in VIEW_CONFIG:
                self._send(handler, 404, _page("Unknown type", "<h1>404</h1>"))
                return True
            token, csrf_cookie = self._csrf_token(handler)
            self._send(
                handler,
                200,
                _page(
                    "New Connection",
                    self._form_html(t, "/dashboard/connections/upsert", token),
                ),
                [cookie, csrf_cookie],
            )
            return True

        m = re.fullmatch(r"/dashboard/connections/edit/([A-Za-z_][A-Za-z0-9_]*)", path)
        if m:
            name = m.group(1)
            t = self.dest_dashboard_type.get(name)
            if name not in self.service.destinations or t is None:
                self._send(
                    handler, 404, _page("Not found", "<h1>Connection not found</h1>")
                )
                return True
            token, csrf_cookie = self._csrf_token(handler)
            self._send(
                handler,
                200,
                _page(
                    "Edit Connection",
                    self._form_html(
                        t,
                        "/dashboard/connections/upsert",
                        token,
                        name=name,
                        values=self.dest_settings.get(name, {}),
                        existing=True,
                    ),
                ),
                [cookie, csrf_cookie],
            )
            return True

        self._send(handler, 404, _page("Not found", "<h1>404</h1>"))
        return True

    def _connections_index(self, handler, cookie):
        token, csrf_cookie = self._csrf_token(handler)
        rows = []
        for d in self.service.list_destinations():
            n = _e(d["name"])
            # edit needs the dashboard-side form state (type + saved
            # settings); API-created or config-time connections have
            # none, so they get no dead link
            edit = (
                f"<a href='/dashboard/connections/edit/{n}'>edit</a> "
                if d["name"] in self.dest_dashboard_type
                else ""
            )
            rows.append(
                f"<tr><td>{n}</td><td>{_e(d['type'])}</td><td>"
                f"{edit}"
                f"<form class='inline' method='post'"
                f" action='/dashboard/connections/keys'>"
                f"<input type='hidden' name='name' value='{n}'>"
                f"<input type='hidden' name='csrf_token' value='{token}'>"
                f"<button>new key</button></form> "
                f"<form class='inline' method='post'"
                f" action='/dashboard/connections/delete'>"
                f"<input type='hidden' name='name' value='{n}'>"
                f"<input type='hidden' name='csrf_token' value='{token}'>"
                f"<button>delete</button></form></td></tr>"
            )
        req_opts = "".join(
            f"<option value='{t}'>{_e(vc['display'])}</option>"
            for t, vc in sorted(VIEW_CONFIG.items())
        )
        body = (
            f"{self._flash_html(handler)}"
            "<h1>Connections</h1>"
            "<p><a href='/dashboard/connections/new'>New Connection</a></p>"
            f"<table><tr><th>Name</th><th>Type</th><th></th></tr>"
            f"{''.join(rows)}</table>"
            "<h2>Request credentials from someone else</h2>"
            "<form method='post' action='/dashboard/connections/request'>"
            f"<select name='type'>{req_opts}</select>"
            f"<input type='hidden' name='csrf_token' value='{token}'>"
            "<button>Create link</button></form>"
        )
        self._send(handler, 200, _page("Connections", body), [cookie, csrf_cookie])

    def _share_page(self, handler, uid: str):
        """pages/share.html — name, expiry date, format links."""
        share = self.service.shares.get(uid)
        if share is None:
            self._send(
                handler, 404, _page("Not found", "<h1>Query not found</h1>")
            )
            return
        expires = datetime.fromtimestamp(share.expires_at, tz=timezone.utc)
        expires_str = f"{expires.strftime('%B')} {expires.day}, {expires.year}"
        body = (
            f"<h1>{_e(share.name or 'Shared query')}</h1>"
            f"<p>Expires {expires_str}</p>"
            f"<p><a href='/share/{_e(uid)}/data.csv'>CSV</a> · "
            f"<a href='/share/{_e(uid)}/data.json'>JSON</a></p>"
        )
        self._send(handler, 200, _page("Shared query", body))

    def _request_form(self, handler, rid: str):
        req = self.requests.get(rid)
        if req is None:
            self._send(
                handler,
                404,
                _page("Request expired", "<h1>Request not found or expired</h1>"),
            )
            return
        _, dest_type = req
        token, csrf_cookie = self._csrf_token(handler)
        self._send(
            handler,
            200,
            _page(
                "Connect your database",
                self._form_html(
                    dest_type, "/request/upsert", token, request_id=rid
                ),
            ),
            csrf_cookie,
        )

    # ------------------------------------------------------------ POST
    def handle_post(self, handler, path: str, params: dict) -> bool:
        if path not in (
            "/dashboard/connections/upsert",
            "/dashboard/connections/keys",
            "/dashboard/connections/delete",
            "/dashboard/connections/request",
            "/request/upsert",
        ):
            return False
        raw = handler._body().decode()
        form = {k: v[0] for k, v in parse_qs(raw, keep_blank_values=True).items()}
        if not self._csrf_ok(handler, form):
            self._send(handler, 403, _page("Forbidden", "<h1>Bad CSRF token</h1>"))
            return True
        if path == "/request/upsert":
            self._request_upsert(handler, form)
            return True
        if not self._is_admin(handler, params):
            self._send(
                handler, 401, _page("Unauthorized", "<h1>admin key required</h1>")
            )
            return True

        if path == "/dashboard/connections/upsert":
            try:
                name, api_key = self._upsert(form)
            except FormError as fe:
                token, csrf_cookie = self._csrf_token(handler)
                self._send(
                    handler,
                    200,
                    _page(
                        "New Connection",
                        self._form_html(
                            form.get("type", ""),
                            "/dashboard/connections/upsert",
                            token,
                            name=form.get("name", ""),
                            values=form,
                            flash=f"{fe.title} {fe.message}",
                            existing=form.get("existing") == "1",
                        ),
                    ),
                    csrf_cookie,
                )
                return True
            if api_key is None:  # edit: keys unchanged, no key page
                # post-redirect-get: a refresh must not resubmit the form
                self._flash_add(
                    handler, "success",
                    f"Connection “{name}” updated.",
                    "Existing API keys keep working.",
                )
                self._redirect(handler, "/dashboard/connections")
                return True
            self._send(handler, 200, _page("API key", self._api_key_page(name, api_key)))
            return True

        if path == "/dashboard/connections/keys":
            name = form.get("name", "")
            try:
                api_key = self.service.create_key(name)
            except KeyError:
                self._send(
                    handler, 404, _page("Not found", "<h1>Connection not found</h1>")
                )
                return True
            self._send(handler, 200, _page("API key", self._api_key_page(name, api_key)))
            return True

        if path == "/dashboard/connections/delete":
            name = form.get("name", "")
            try:
                self.service.delete_destination(name)
            except KeyError:
                self._send(
                    handler, 404, _page("Not found", "<h1>Connection not found</h1>")
                )
                return True
            self.dest_settings.pop(name, None)
            self.dest_dashboard_type.pop(name, None)
            self._flash_add(
                handler, "success", f"Connection “{name}” deleted."
            )
            self._redirect(handler, "/dashboard/connections")
            return True

        if path == "/dashboard/connections/request":
            dest_type = form.get("type", "")
            if dest_type not in VIEW_CONFIG:
                self._send(
                    handler, 400, _page("Bad request", "<h1>Unknown type</h1>")
                )
                return True
            # "%s Request" placeholder name — connections/service.go:66
            rid = self.requests.create(f"{dest_type} Request", dest_type)
            url = f"{self.external_url}/request/{rid}"
            body = (
                "<h1>Share this link</h1>"
                "<p>Anyone with the link can submit credentials for this"
                " connection. It expires in 7 days.</p>"
                f"<p class='key'>{_e(url)}</p>"
                "<p><a href='/dashboard/connections'>Back</a></p>"
            )
            self._send(handler, 200, _page("Connection request", body))
            return True
        return True  # unreachable

    def _request_upsert(self, handler, form: dict[str, str]):
        rid = form.get("request_id", "")
        req = self.requests.get(rid)
        if req is None:
            self._send(
                handler,
                404,
                _page("Request expired", "<h1>Request not found or expired</h1>"),
            )
            return
        stored_name, dest_type = req
        form["type"] = dest_type  # the link's type wins over the form's
        form.pop("existing", None)  # request links only ever create
        # the form name wins (reference UpdateConnection sets Name from
        # the form); the stored "%s Request" placeholder is the
        # fallback when the submitter leaves it blank
        name = form.get("name", "").strip() or re.sub(
            r"\W+", "_", stored_name
        )
        try:
            self._upsert(form, name_override=name)
        except FormError as fe:
            token, csrf_cookie = self._csrf_token(handler)
            self._send(
                handler,
                200,
                _page(
                    "Connect your database",
                    self._form_html(
                        dest_type,
                        "/request/upsert",
                        token,
                        name=form.get("name", ""),
                        values=form,
                        request_id=rid,
                        flash=f"{fe.title} {fe.message}",
                    ),
                ),
                csrf_cookie,
            )
            return
        self.requests.delete(rid)
        # third party never sees the API key — the admin mints their own
        self._redirect(handler, "/request/success")
