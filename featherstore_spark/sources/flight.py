"""Arrow Flight serving of feature sets (SURVEY §2 S8/S9 + serve
family) — the transport the reference exposes in
/root/reference/pkg/flight/server.go, re-expressed over the Spark-built
store:

- ``DoGet`` (server.go:242-300): ticket ``{"feature_set": …,
  "entity_ids": […]}`` → latest feature row per entity;
  ``{"feature_set": …, "entity_id": …, "start_time": …, "end_time": …}``
  → inclusive time-range history, newest first.  Timestamps are RFC3339
  / ISO-8601 strings, as in the reference ticket contract.
- ``DoPut`` (server.go:352): descriptor path = feature-set name; the
  record-batch stream is schema-checked and appended to the set's data
  files (atomic tmp+rename).
- ``DoAction`` (server.go:477): ``create_feature_set`` /
  ``get_feature_set`` / ``list_feature_sets`` / ``delete_feature_set``
  with JSON bodies.
- ``ListFlights`` / ``GetFlightInfo`` (server.go:111,151): one flight
  per feature set, schema attached.

The server holds NO SparkSession: Spark materializes the tables, this
tier reads them with pyarrow.dataset (predicate pushdown into row-group
stats; see sources/serving.py for the bucket-pruned point-lookup path).
Row-level results are differentially tested against the Spark J1/P3
operators in tests/test_serving.py.
"""

from __future__ import annotations

import json

import pyarrow.flight as fl

from featherstore_spark.sources.serving import ServingError, ServingStore
from featherstore_spark.sources.serving import parse_ts as _parse_ts


class FeatureFlightServer(fl.FlightServerBase):
    def __init__(self, root: str, location: str = "grpc://127.0.0.1:0", **kw):
        super().__init__(location, **kw)
        self.store = ServingStore(root)

    # -- discovery -------------------------------------------------------
    def list_flights(self, context, criteria):
        for name in self.store.list_feature_sets():
            yield self._info(name)

    def get_flight_info(self, context, descriptor):
        name = descriptor.path[0].decode()
        return self._info(name)

    def _info(self, name: str) -> fl.FlightInfo:
        ticket = fl.Ticket(json.dumps({"feature_set": name}).encode())
        return fl.FlightInfo(
            self.store.arrow_schema(name),
            fl.FlightDescriptor.for_path(name),
            [fl.FlightEndpoint(ticket, [])],
            -1, -1,
        )

    # -- reads -----------------------------------------------------------
    def do_get(self, context, ticket):
        t = json.loads(ticket.ticket.decode())
        if t.get("bucketed_table"):
            # point lookup over a registered checkpoint output: only the
            # p_bucket dirs the entities hash to are opened (serving.py)
            table = self.store.get_bucketed_rows(
                t["bucketed_table"], t.get("entity_ids") or []
            )
            return fl.RecordBatchStream(table)
        name = t.get("feature_set")
        if not name:
            raise fl.FlightServerError("ticket must name a feature_set or bucketed_table")
        if "points" in t:
            # presence, not truthiness: an empty points list must return
            # an empty point table, never fall through to latest-of-all
            # point-in-time vectors at explicit (entity, ts) requests —
            # the as-of semantic at the serving edge
            pts = [(p[0], _parse_ts(p[1])) for p in t["points"]]
            return fl.RecordBatchStream(self.store.get_features_at(name, pts))
        if t.get("entity_id") is not None:
            # singular entity_id selects the HISTORY path regardless of
            # bounds (None = unbounded); routing on the bounds would
            # silently fall through to latest-per-ALL-entities
            table = self.store.get_feature_history(
                name, t["entity_id"], _parse_ts(t.get("start_time")), _parse_ts(t.get("end_time")),
            )
        else:
            table = self.store.get_features(
                name, entity_ids=t.get("entity_ids"), as_of=_parse_ts(t.get("as_of")),
            )
        return fl.RecordBatchStream(table)

    # -- ingest ----------------------------------------------------------
    def do_put(self, context, descriptor, reader, writer):
        name = descriptor.path[0].decode()
        n = self.store.append_batch(name, reader.read_all())
        writer.write(json.dumps({"rows": n}).encode())

    # -- feature-set DDL -------------------------------------------------
    def do_action(self, context, action):
        body = json.loads(action.body.to_pybytes().decode()) if action.body else {}
        if action.type == "create_feature_set":
            out = self.store.create_feature_set(body.pop("name"), body)
        elif action.type == "get_feature_set":
            out = self.store.get_meta(body["name"])
        elif action.type == "list_feature_sets":
            out = self.store.list_feature_sets()
        elif action.type == "delete_feature_set":
            self.store.delete_feature_set(body["name"])
            out = {"deleted": body["name"]}
        else:
            raise fl.FlightServerError(f"unknown action {action.type!r}")
        yield fl.Result(json.dumps(out, default=str).encode())

    def list_actions(self, context):
        return [
            ("create_feature_set", "register a feature set (JSON meta)"),
            ("get_feature_set", "fetch feature-set metadata"),
            ("list_feature_sets", "list registered feature sets"),
            ("delete_feature_set", "drop a feature set and its data"),
        ]


def serve(root: str, host: str = "127.0.0.1", port: int = 0) -> FeatureFlightServer:
    """Start a Flight server on ``host:port`` (0 = auto-assign; read
    ``server.port``) over a catalog root."""
    return FeatureFlightServer(root, f"grpc://{host}:{port}")


class FeatureFlightClient:
    """Thin typed client over ``pyarrow.flight.FlightClient`` mirroring
    the reference's python client surface
    (/root/reference/python/featherstore_client.py: get_features,
    get_feature_history, ingest_batch, create/list/delete)."""

    def __init__(self, uri: str):
        self.conn = fl.FlightClient(uri)

    def get_features(self, feature_set: str, entity_ids=None, as_of=None):
        t = {"feature_set": feature_set}
        if entity_ids is not None:
            t["entity_ids"] = list(entity_ids)
        if as_of is not None:
            t["as_of"] = as_of.isoformat() if hasattr(as_of, "isoformat") else as_of
        return self.conn.do_get(fl.Ticket(json.dumps(t).encode())).read_all()

    def get_features_at(self, feature_set: str, points):
        """Point-in-time vectors at (entity, ts) pairs (as-of serving)."""
        t = {
            "feature_set": feature_set,
            "points": [
                [e, ts.isoformat() if hasattr(ts, "isoformat") else ts]
                for e, ts in points
            ],
        }
        return self.conn.do_get(fl.Ticket(json.dumps(t).encode())).read_all()

    def get_bucketed_rows(self, table: str, entity_ids):
        t = {"bucketed_table": table, "entity_ids": list(entity_ids)}
        return self.conn.do_get(fl.Ticket(json.dumps(t).encode())).read_all()

    def get_feature_history(self, feature_set: str, entity_id, start, end):
        t = {
            "feature_set": feature_set, "entity_id": entity_id,
            "start_time": start.isoformat() if hasattr(start, "isoformat") else start,
            "end_time": end.isoformat() if hasattr(end, "isoformat") else end,
        }
        return self.conn.do_get(fl.Ticket(json.dumps(t).encode())).read_all()

    def ingest_batch(self, feature_set: str, table) -> int:
        desc = fl.FlightDescriptor.for_path(feature_set)
        writer, meta_reader = self.conn.do_put(desc, table.schema)
        writer.write_table(table)
        writer.done_writing()
        ack_buf = meta_reader.read()  # None when the server errored
        writer.close()  # raises the server-side FlightError if any
        if ack_buf is None:
            raise fl.FlightServerError(f"ingest into {feature_set!r}: no ack")
        return json.loads(ack_buf.to_pybytes().decode())["rows"]

    def _action(self, name: str, body: dict | None = None):
        act = fl.Action(name, json.dumps(body or {}).encode())
        results = list(self.conn.do_action(act))
        return json.loads(results[0].body.to_pybytes().decode()) if results else None

    def create_feature_set(self, name: str, meta: dict):
        return self._action("create_feature_set", {"name": name, **meta})

    def get_feature_set(self, name: str):
        return self._action("get_feature_set", {"name": name})

    def list_feature_sets(self):
        return self._action("list_feature_sets")

    def delete_feature_set(self, name: str):
        return self._action("delete_feature_set", {"name": name})
