package graft.server

/** Machine-readable API descriptions served by [[WireServer]] — the
  * reference embeds an OpenAPI spec for its REST routes and an AsyncAPI
  * spec for its WebSocket protocol and serves both as YAML plus an HTML
  * protocol page (`/root/reference/src/protocol/rest/mod.rs:239-244`).
  * These documents describe THIS server's actual surface; they are
  * authored here, not copied, and kept deliberately small: every path,
  * message type, and field named below exists in [[WireServer]] and is
  * exercised by WireServerSpec.
  */
object ApiSpec {

  /** OpenAPI 3.0 description of the REST surface. */
  val openApiYaml: String =
    """openapi: 3.0.3
      |info:
      |  title: graft wire server REST API
      |  description: >
      |    HTTP surface of the graft Spark-native analytics engine.
      |    Statements posted to /query use the engine's query language;
      |    results are JSON rows with a truncated flag governed by
      |    max_result_rows (default 100000, 0 = unlimited opt-in).
      |  version: "1.0"
      |paths:
      |  /health:
      |    get: {summary: Liveness probe, responses: {"200": {description: healthy}}}
      |  /live:
      |    get: {summary: Liveness probe alias, responses: {"200": {description: healthy}}}
      |  /ready:
      |    get: {summary: Readiness probe, responses: {"200": {description: ready}}}
      |  /metrics:
      |    get: {summary: JSON server metrics, responses: {"200": {description: metrics object}}}
      |  /metrics/prometheus:
      |    get:
      |      summary: Prometheus text exposition format
      |      responses: {"200": {description: "text/plain gauges and counters"}}
      |  /api/openapi.yaml:
      |    get: {summary: This document, responses: {"200": {description: YAML}}}
      |  /api/asyncapi.yaml:
      |    get: {summary: WebSocket protocol spec, responses: {"200": {description: YAML}}}
      |  /api/ws-docs:
      |    get: {summary: Human-readable WebSocket protocol page, responses: {"200": {description: HTML}}}
      |  /query:
      |    post:
      |      summary: Execute one query/statement message
      |      requestBody:
      |        content:
      |          application/json:
      |            schema:
      |              type: object
      |              properties:
      |                type: {type: string, enum: [query, insert_facts, retract_facts, add_rule, ping]}
      |                query: {type: string}
      |                timeout_ms: {type: integer}
      |                max_result_rows: {type: integer, description: "0 = unlimited (opt-in)"}
      |      responses:
      |        "200":
      |          description: result / ack / error message
      |          content:
      |            application/json:
      |              schema:
      |                type: object
      |                properties:
      |                  type: {type: string, enum: [result, ack, error, pong]}
      |                  columns: {type: array, items: {type: string}}
      |                  rows: {type: array}
      |                  row_count: {type: integer}
      |                  truncated: {type: boolean}
      |                  execution_time_ms: {type: integer}
      |  /auth/keys:
      |    post: {summary: Create an API key (admin), responses: {"200": {description: key}}}
      |    get: {summary: List API key hashes (admin), responses: {"200": {description: keys}}}
      |  /auth/revoke:
      |    post: {summary: Revoke an API key (admin), responses: {"200": {description: ack}}}
      |""".stripMargin

  /** AsyncAPI 2.x description of the WebSocket protocol. */
  val asyncApiYaml: String =
    """asyncapi: "2.6.0"
      |info:
      |  title: graft wire server WebSocket protocol
      |  description: >
      |    JSON messages over /ws (or /sessions/{id}/ws). Each client
      |    message yields one or more server messages; large results
      |    stream as result_start / result_chunk / result_end; rules
      |    registered as persistent updates push change notifications.
      |  version: "1.0"
      |channels:
      |  /ws:
      |    publish:
      |      summary: Client → server messages
      |      message:
      |        payload:
      |          type: object
      |          properties:
      |            type: {type: string, enum: [query, insert_facts, retract_facts, add_rule, ping]}
      |            query: {type: string}
      |            rule: {type: string}
      |            relation: {type: string}
      |            tuples: {type: array}
      |            timeout_ms: {type: integer}
      |            max_result_rows: {type: integer}
      |    subscribe:
      |      summary: Server → client messages
      |      message:
      |        payload:
      |          type: object
      |          properties:
      |            type:
      |              type: string
      |              enum: [result, result_start, result_chunk, result_end,
      |                     ack, error, pong, notification]
      |            columns: {type: array, items: {type: string}}
      |            rows: {type: array}
      |            row_count: {type: integer}
      |            truncated: {type: boolean}
      |            proof_trees: {type: array}
      |            execution_time_ms: {type: integer}
      |""".stripMargin

  /** Self-contained protocol page for humans. */
  val wsDocsHtml: String =
    """<!DOCTYPE html>
      |<html><head><meta charset="utf-8"><title>graft WebSocket protocol</title></head>
      |<body>
      |<h1>graft wire server &mdash; WebSocket protocol</h1>
      |<p>Connect to <code>/ws</code> (shared default session per connection)
      |or <code>/sessions/{id}/ws</code>. Send JSON text frames:</p>
      |<pre>{"type":"query","query":"?edge(X, Y)"}
      |{"type":"insert_facts","relation":"edge","tuples":[[1,2]]}
      |{"type":"retract_facts","relation":"edge","tuples":[[1,2]]}
      |{"type":"add_rule","rule":"path(X, Y) &lt;- edge(X, Y)"}
      |{"type":"ping"}</pre>
      |<p>Server replies with <code>result</code> / <code>ack</code> /
      |<code>error</code> / <code>pong</code>. Results above the streaming
      |threshold arrive as <code>result_start</code>, repeated
      |<code>result_chunk</code>, then <code>result_end</code>. Results cap
      |at <code>max_result_rows</code> (default 100000) with
      |<code>"truncated": true</code>; pass <code>"max_result_rows": 0</code>
      |to opt out. Rules ending in a persistent-update head push
      |<code>notification</code> messages when their result changes.</p>
      |<p>Machine-readable specs: <a href="/api/openapi.yaml">OpenAPI</a>,
      |<a href="/api/asyncapi.yaml">AsyncAPI</a>.</p>
      |</body></html>
      |""".stripMargin
}
