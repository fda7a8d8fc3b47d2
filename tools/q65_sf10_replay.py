import duckdb, time
t0=time.time()
con = duckdb.connect()
con.execute("PRAGMA threads=16")
con.execute("SET max_temp_directory_size='60GiB'")
con.execute("""CREATE VIEW documents AS SELECT * FROM
  read_parquet('/root/repo/data/sf10/documents.parquet/*.parquet')""")
con.execute("""
CREATE TEMP TABLE edges AS
WITH sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
        FROM documents),
    UNNEST(range(1, len(ws) - 1)) t(i)),
hb AS (SELECT doc_id, ('0x' || substr(md5(s),1,15))::BIGINT % 1000000007 AS h FROM sh),
mh AS (
  SELECT doc_id, j, min((a * h + b) % 1000000007) AS mh
  FROM hb, (VALUES (0, 654435747, 40520), (1, 308871487, 81023), (2, 963307234, 121526), (3, 617742974, 162029), (4, 272178714, 202532), (5, 926614461, 243035), (6, 581050201, 283538), (7, 235485941, 324041), (8, 889921688, 364544), (9, 544357428, 405047), (10, 198793168, 445550), (11, 853228915, 486053), (12, 507664655, 526556), (13, 162100395, 567059), (14, 816536142, 607562), (15, 470971882, 648065)) t(j, a, b)
  GROUP BY doc_id, j),
sig AS (SELECT doc_id, list(CAST(mh AS VARCHAR) ORDER BY j) AS sig FROM mh GROUP BY doc_id),
bands AS (
  SELECT doc_id, b, md5(sig[b*4+1] || ',' || sig[b*4+2] || ',' || sig[b*4+3] || ',' || sig[b*4+4]) AS bh
  FROM sig, UNNEST(range(0, 4)) t(b)),
cand AS (
  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
  FROM bands x JOIN bands y
    ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
SELECT a_id AS src, b_id AS dst FROM cand
UNION SELECT b_id, a_id FROM cand
""")
ne = con.execute("SELECT count(*) FROM edges").fetchone()[0]
print(f"edges: {ne} ({time.time()-t0:.0f}s)", flush=True)
con.execute("CREATE TEMP TABLE lbl AS SELECT DISTINCT src AS id, src AS g FROM edges")
for r in range(64):
    # one propagation round + pointer-halving (g := lbl[g])
    con.execute("""
      CREATE TEMP TABLE lbl2 AS
      SELECT id, least(min(g1), min(gh)) AS g FROM (
        SELECT l.id, least(l.g, nb.g) AS g1, lh.g AS gh
        FROM lbl l
        JOIN edges e ON e.src = l.id
        JOIN lbl nb ON nb.id = e.dst
        JOIN lbl lh ON lh.id = l.g) GROUP BY id""")
    changed = con.execute(
      "SELECT count(*) FROM lbl a JOIN lbl2 b USING (id) WHERE a.g <> b.g"
    ).fetchone()[0]
    con.execute("DROP TABLE lbl"); con.execute("ALTER TABLE lbl2 RENAME TO lbl")
    print(f"round {r}: changed {changed} ({time.time()-t0:.0f}s)", flush=True)
    if changed == 0: break
n_diff = con.execute("""
  SELECT count(*) FROM (
    SELECT d.doc_id, COALESCE(l.g, d.doc_id) AS group_id,
      CASE WHEN COALESCE(l.g, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS kept
    FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id) w
  JOIN read_parquet('/tmp/verify_sf10/q65_neardup_groups/*.parquet') r
    USING (doc_id)
  WHERE r.group_id IS DISTINCT FROM w.group_id
     OR r.kept IS DISTINCT FROM w.kept""").fetchone()[0]
nr = con.execute("SELECT count(*) FROM read_parquet('/tmp/verify_sf10/q65_neardup_groups/*.parquet')").fetchone()[0]
nd = con.execute("SELECT count(*) FROM documents").fetchone()[0]
print(f"rows {nr} (docs {nd}), differing rows: {n_diff} ({time.time()-t0:.0f}s)", flush=True)
print("Q65_SF10_" + ("OK" if n_diff == 0 and nr == nd else "FAIL"), flush=True)
