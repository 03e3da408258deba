"""Connection registry (F7) — name → JDBC options bundle.

The reference builds live SQLAlchemy engines at pipeline-load time
(etl.py:363-381), interpolating ``${var.*}`` in URLs eagerly. We parse
the same SQLAlchemy-style URLs but hold a lazy options bundle for
``spark.read/write.format("jdbc")`` — no connection is opened until a
step actually reads/writes.

``repr`` matches SQLAlchemy's password-masked Engine string so the
reference's connection tests port over
(/root/reference/tests/test_etl.py:131-139).
"""

from __future__ import annotations

import re
from typing import Any

# sqlalchemy dialect(+driver) → JDBC subprotocol + driver class
_DIALECTS = {
    "postgresql": ("postgresql", "org.postgresql.Driver"),
    "mysql": ("mysql", "com.mysql.cj.jdbc.Driver"),
    "mariadb": ("mariadb", "org.mariadb.jdbc.Driver"),
    "mssql": ("sqlserver", "com.microsoft.sqlserver.jdbc.SQLServerDriver"),
    "oracle": ("oracle", "oracle.jdbc.OracleDriver"),
    "sqlite": ("sqlite", "org.sqlite.JDBC"),
}

_URL_RE = re.compile(
    r"^(?P<dialect>[\w]+)(\+(?P<driver>[\w]+))?://"
    r"(?:(?P<user>[^:@/]+)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<host>[^:/@]+)?(?::(?P<port>\d+))?"
    r"(?:/(?P<database>[^?]*))?$"
)


class Connection:
    """A named database connection, SQLAlchemy-URL-compatible."""

    def __init__(self, url_or_kwargs: str | dict[str, Any]):
        if isinstance(url_or_kwargs, dict):
            self.url = url_or_kwargs.get("url", "")
            self.extra = {k: v for k, v in url_or_kwargs.items() if k != "url"}
        else:
            self.url = url_or_kwargs
            self.extra = {}
        if self.url.startswith("jdbc:"):
            # raw JDBC URL (e.g. embedded derby) — pass through verbatim
            self.dialect = self.url.split(":", 2)[1]
            self.user = self.password = self.host = self.port = self.database = None
            self._raw_jdbc = True
            return
        self._raw_jdbc = False
        m = _URL_RE.match(self.url)
        if not m:
            raise ValueError(f"Unrecognized connection URL: {self.url!r}")
        self.dialect = m.group("dialect")
        self.user = m.group("user")
        self.password = m.group("password")
        self.host = m.group("host")
        self.port = m.group("port")
        self.database = m.group("database")

    def jdbc_options(self) -> dict[str, str]:
        if self._raw_jdbc:
            opts = {"url": self.url}
            opts.update({k: str(v) for k, v in self.extra.items()})
            return opts
        sub, driver = _DIALECTS.get(self.dialect, (self.dialect, ""))
        hostpart = self.host or ""
        if self.port:
            hostpart += f":{self.port}"
        opts = {"url": f"jdbc:{sub}://{hostpart}/{self.database or ''}"}
        if driver:
            opts["driver"] = driver
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        opts.update({k: str(v) for k, v in self.extra.items()})
        return opts

    def __repr__(self) -> str:  # sqlalchemy-Engine-compatible masking
        if self._raw_jdbc:
            return f"Engine({self.url})"
        auth = ""
        if self.user:
            auth = self.user + (":***" if self.password else "") + "@"
        hostpart = self.host or ""
        if self.port:
            hostpart += f":{self.port}"
        dialect = self.dialect + (f"+{d}" if (d := _driver_of(self.url)) else "")
        return f"Engine({dialect}://{auth}{hostpart}/{self.database or ''})"

    __str__ = __repr__


def _driver_of(url: str) -> str | None:
    m = _URL_RE.match(url)
    return m.group("driver") if m else None


class _Connections:
    """Attribute-access registry: ``conn.name`` → Connection."""

    def __init__(self, conns: dict[str, Any], resolver) -> None:
        resolved = {
            name: Connection(resolver.resolve(value)) for name, value in (conns or {}).items()
        }
        self.__dict__.update(resolved)

    def get_names(self):
        return self.__dict__.keys()
