package graft

/** DuckDB replicas of the flagship FSM (`RuleFsm`/`ConvParser`/`DocType`,
  * i.e. cis_pdf_parser.py:59-218 semantics) over the MATERIALIZED transcript
  * fixtures — the last "non-SQL-expressible" operators made cross-engine
  * checkable. Design:
  *
  *  - cover classification: the reference's lookaround cover regex
  *    `(?<=CIS).*(?=Benchmark)` is rewritten for RE2 (no lookarounds) as
  *    group 1 of `(?s)CIS(.*)Benchmark` — identical extent because the
  *    greedy `.*` runs to the LAST `Benchmark` in both engines;
  *  - P8 gate: LAST page containing "Recommendations 1 " via MAX over a
  *    flagged ordinal; pages before it are skipped, unknown covers /
  *    gateless conversations are invalid (no rows) — exactly ConvParser;
  *  - per-page section slicing: the reference's `split(open,1)[1]
  *    .partition(close)[0].strip()` chain is strpos/substr arithmetic; the
  *    Python `str.strip()` whitespace set (incl. NBSP/NEL/C0 separators and
  *    the Unicode space/line/paragraph separators) is an explicit `trim`
  *    charset; the char-class scrubs are RE2 classes (maximal disallowed
  *    run -> one space, same as RuleFsm.scrub);
  *  - rule regex offsets: DuckDB has no match-position function; `start` is
  *    recovered as `strpos(text, match)` — sound because if the matched
  *    substring occurred earlier, the (lookaround-free) pattern would have
  *    matched there first;
  *  - cross-page state: the six tracked counters are windowed cumulative
  *    sums; carried section values are `last_value(... IGNORE NULLS)`;
  *    emission = counters aligned AND first page reaching that aligned value
  *    (equivalent to the reference's single-entry seenList because counters
  *    are non-decreasing); ONLY the Default Value backfill (defval counter
  *    synthesized when CIS Controls advances without it) is genuinely
  *    sequential and threads through a per-conversation recursive CTE.
  *
  * Validated byte-identical against the Spark pipeline on both fixtures
  * (3590 spans / 877 records) before wiring. `__FIX__` is replaced with the
  * fixture parquet glob by SparkEntry. */
object FsmOracleSql {

  val spans: String =
    """WITH t AS (SELECT conv_id, turn_idx, text,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS ord
  FROM parquet_scan('__FIX__')),
cover AS (SELECT conv_id, text AS cov FROM t WHERE ord = 0),
cls AS (SELECT conv_id,
    CASE WHEN NOT regexp_matches(cov, '(?s)CIS(.*)Benchmark') THEN 'quirk'
         ELSE (CASE
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Red Hat Enterprise Linux 7') THEN 'linux'
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Debian Linux 11') THEN 'linux'
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Microsoft Windows Server 2019') THEN 'win2019'
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Microsoft Windows 10 Enterprise') THEN 'win10'
           ELSE 'unknown' END) END AS dt
  FROM cover),
gate AS (SELECT conv_id, MAX(CASE WHEN strpos(text, 'Recommendations 1 ') > 0 THEN ord END) AS first_ord
  FROM t GROUP BY conv_id),
pages AS (SELECT t.conv_id, t.turn_idx, t.text, c.dt,
    row_number() OVER (PARTITION BY t.conv_id ORDER BY t.turn_idx) AS rn
  FROM t JOIN cls c ON t.conv_id = c.conv_id
         JOIN gate g ON t.conv_id = g.conv_id
  WHERE c.dt <> 'unknown' AND g.first_ord IS NOT NULL AND t.ord >= g.first_ord),
rulem AS (SELECT conv_id, turn_idx, text,
    CASE dt WHEN 'linux' THEN regexp_extract(text, '(?s)(\d+(?:\.\d.\d*)+)(.*?)(\(Automated\)|\(Manual\))', 0)
            WHEN 'win2019' THEN regexp_extract(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG))\)(.*?)(\(Automated\)|\(Manual\))', 0)
            WHEN 'win10' THEN regexp_extract(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG)|(BL))\)(.*?)(\(Automated\)|\(Manual\))', 0)
            ELSE regexp_extract(text, '(?s)CIS(.*)Benchmark', 1) END AS m,
    CASE dt WHEN 'linux' THEN regexp_matches(text, '(?s)(\d+(?:\.\d.\d*)+)(.*?)(\(Automated\)|\(Manual\))')
            WHEN 'win2019' THEN regexp_matches(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG))\)(.*?)(\(Automated\)|\(Manual\))')
            WHEN 'win10' THEN regexp_matches(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG)|(BL))\)(.*?)(\(Automated\)|\(Manual\))')
            ELSE regexp_matches(text, '(?s)CIS(.*)Benchmark') END AS ok,
    dt
  FROM pages)
SELECT conv_id, turn_idx, 'rule' AS label,
    (CASE WHEN dt = 'quirk' THEN strpos(text, 'CIS') + 2 ELSE strpos(text, m) - 1 END)::INTEGER AS "start",
    (CASE WHEN dt = 'quirk' THEN strpos(text, 'CIS') + 2 + length(m) ELSE strpos(text, m) - 1 + length(m) END)::INTEGER AS "end",
    m AS text
  FROM rulem WHERE ok
UNION ALL SELECT conv_id, turn_idx, 'profile_applicability' AS label,
  (strpos(text, 'Profile Applicability:') - 1 + 22)::INTEGER AS "start",
  (CASE WHEN strpos(substr(text, strpos(text, 'Profile Applicability:') + 22), 'Description:') = 0 THEN length(text)
        ELSE strpos(text, 'Profile Applicability:') - 1 + 22 + strpos(substr(text, strpos(text, 'Profile Applicability:') + 22), 'Description:') - 1 END)::INTEGER AS "end",
  regexp_replace(trim(CASE WHEN strpos(substr(text, strpos(text, 'Profile Applicability:') + 22), 'Description:') = 0
         THEN substr(text, strpos(text, 'Profile Applicability:') + 22)
         ELSE substr(substr(text, strpos(text, 'Profile Applicability:') + 22), 1,
              strpos(substr(text, strpos(text, 'Profile Applicability:') + 22), 'Description:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), '[^a-zA-Z0-9\n-]+', ' ', 'g') AS text
FROM pages WHERE strpos(text, 'Profile Applicability:') > 0
UNION ALL SELECT conv_id, turn_idx, 'description' AS label,
  (strpos(text, 'Description:') - 1 + 12)::INTEGER AS "start",
  (CASE WHEN strpos(substr(text, strpos(text, 'Description:') + 12), 'Rationale') = 0 THEN length(text)
        ELSE strpos(text, 'Description:') - 1 + 12 + strpos(substr(text, strpos(text, 'Description:') + 12), 'Rationale') - 1 END)::INTEGER AS "end",
  trim(CASE WHEN strpos(substr(text, strpos(text, 'Description:') + 12), 'Rationale') = 0
         THEN substr(text, strpos(text, 'Description:') + 12)
         ELSE substr(substr(text, strpos(text, 'Description:') + 12), 1,
              strpos(substr(text, strpos(text, 'Description:') + 12), 'Rationale') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) AS text
FROM pages WHERE strpos(text, 'Description:') > 0
UNION ALL SELECT conv_id, turn_idx, 'rationale' AS label,
  (strpos(text, 'Rationale:') - 1 + 10)::INTEGER AS "start",
  (CASE WHEN strpos(substr(text, strpos(text, 'Rationale:') + 10), 'Audit:') = 0 THEN length(text)
        ELSE strpos(text, 'Rationale:') - 1 + 10 + strpos(substr(text, strpos(text, 'Rationale:') + 10), 'Audit:') - 1 END)::INTEGER AS "end",
  trim(CASE WHEN strpos(substr(text, strpos(text, 'Rationale:') + 10), 'Audit:') = 0
         THEN substr(text, strpos(text, 'Rationale:') + 10)
         ELSE substr(substr(text, strpos(text, 'Rationale:') + 10), 1,
              strpos(substr(text, strpos(text, 'Rationale:') + 10), 'Audit:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) AS text
FROM pages WHERE strpos(text, 'Rationale:') > 0
UNION ALL SELECT conv_id, turn_idx, 'audit' AS label,
  (strpos(text, '
Audit:') - 1 + 7)::INTEGER AS "start",
  (CASE WHEN strpos(substr(text, strpos(text, '
Audit:') + 7), 'Remediation') = 0 THEN length(text)
        ELSE strpos(text, '
Audit:') - 1 + 7 + strpos(substr(text, strpos(text, '
Audit:') + 7), 'Remediation') - 1 END)::INTEGER AS "end",
  trim(CASE WHEN strpos(substr(text, strpos(text, '
Audit:') + 7), 'Remediation') = 0
         THEN substr(text, strpos(text, '
Audit:') + 7)
         ELSE substr(substr(text, strpos(text, '
Audit:') + 7), 1,
              strpos(substr(text, strpos(text, '
Audit:') + 7), 'Remediation') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) AS text
FROM pages WHERE strpos(text, '
Audit:') > 0
UNION ALL SELECT conv_id, turn_idx, 'remediation' AS label,
  (strpos(text, 'Remediation:') - 1 + 12)::INTEGER AS "start",
  (CASE WHEN strpos(substr(text, strpos(text, 'Remediation:') + 12), 'Default Value:') = 0 THEN length(text)
        ELSE strpos(text, 'Remediation:') - 1 + 12 + strpos(substr(text, strpos(text, 'Remediation:') + 12), 'Default Value:') - 1 END)::INTEGER AS "end",
  trim(CASE WHEN strpos(substr(text, strpos(text, 'Remediation:') + 12), 'Default Value:') = 0
         THEN substr(text, strpos(text, 'Remediation:') + 12)
         ELSE substr(substr(text, strpos(text, 'Remediation:') + 12), 1,
              strpos(substr(text, strpos(text, 'Remediation:') + 12), 'Default Value:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) AS text
FROM pages WHERE strpos(text, 'Remediation:') > 0
UNION ALL SELECT conv_id, turn_idx, 'default_value' AS label,
  (strpos(text, 'Default Value:') - 1 + 14)::INTEGER AS "start",
  (CASE WHEN strpos(substr(text, strpos(text, 'Default Value:') + 14), 'CIS Controls:') = 0 THEN length(text)
        ELSE strpos(text, 'Default Value:') - 1 + 14 + strpos(substr(text, strpos(text, 'Default Value:') + 14), 'CIS Controls:') - 1 END)::INTEGER AS "end",
  trim(CASE WHEN strpos(substr(text, strpos(text, 'Default Value:') + 14), 'CIS Controls:') = 0
         THEN substr(text, strpos(text, 'Default Value:') + 14)
         ELSE substr(substr(text, strpos(text, 'Default Value:') + 14), 1,
              strpos(substr(text, strpos(text, 'Default Value:') + 14), 'CIS Controls:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) AS text
FROM pages WHERE strpos(text, 'Default Value:') > 0
UNION ALL SELECT conv_id, turn_idx, 'cis_controls' AS label,
  (strpos(text, 'CIS Controls:') - 1 + 13)::INTEGER AS "start",
  (CASE WHEN strpos(substr(text, strpos(text, 'CIS Controls:') + 13), 'P a g e') = 0 THEN length(text)
        ELSE strpos(text, 'CIS Controls:') - 1 + 13 + strpos(substr(text, strpos(text, 'CIS Controls:') + 13), 'P a g e') - 1 END)::INTEGER AS "end",
  regexp_replace(trim(CASE WHEN strpos(substr(text, strpos(text, 'CIS Controls:') + 13), 'P a g e') = 0
         THEN substr(text, strpos(text, 'CIS Controls:') + 13)
         ELSE substr(substr(text, strpos(text, 'CIS Controls:') + 13), 1,
              strpos(substr(text, strpos(text, 'CIS Controls:') + 13), 'P a g e') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), '[^a-zA-Z0-9\n.-]+', ' ', 'g') AS text
FROM pages WHERE strpos(text, 'CIS Controls:') > 0"""

  val records: String =
    """WITH RECURSIVE t AS MATERIALIZED (SELECT conv_id, turn_idx, text,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS ord
  FROM parquet_scan('__FIX__')),
cover AS (SELECT conv_id, text AS cov FROM t WHERE ord = 0),
cls AS (SELECT conv_id,
    CASE WHEN NOT regexp_matches(cov, '(?s)CIS(.*)Benchmark') THEN 'quirk'
         ELSE (CASE
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Red Hat Enterprise Linux 7') THEN 'linux'
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Debian Linux 11') THEN 'linux'
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Microsoft Windows Server 2019') THEN 'win2019'
           WHEN contains(replace(trim(regexp_extract(cov, '(?s)CIS(.*)Benchmark', 1), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), chr(10), ''), 'Microsoft Windows 10 Enterprise') THEN 'win10'
           ELSE 'unknown' END) END AS dt
  FROM cover),
gate AS (SELECT conv_id, MAX(CASE WHEN strpos(text, 'Recommendations 1 ') > 0 THEN ord END) AS first_ord
  FROM t GROUP BY conv_id),
pages AS (SELECT t.conv_id, t.turn_idx, t.text, c.dt,
    row_number() OVER (PARTITION BY t.conv_id ORDER BY t.turn_idx) AS rn
  FROM t JOIN cls c ON t.conv_id = c.conv_id
         JOIN gate g ON t.conv_id = g.conv_id
  WHERE c.dt <> 'unknown' AND g.first_ord IS NOT NULL AND t.ord >= g.first_ord),
px AS (SELECT conv_id, turn_idx, rn,
    CASE dt WHEN 'linux' THEN regexp_matches(text, '(?s)(\d+(?:\.\d.\d*)+)(.*?)(\(Automated\)|\(Manual\))')
            WHEN 'win2019' THEN regexp_matches(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG))\)(.*?)(\(Automated\)|\(Manual\))')
            WHEN 'win10' THEN regexp_matches(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG)|(BL))\)(.*?)(\(Automated\)|\(Manual\))')
            ELSE regexp_matches(text, '(?s)CIS(.*)Benchmark') END AS m_rule,
    CASE dt WHEN 'linux' THEN regexp_extract(text, '(?s)(\d+(?:\.\d.\d*)+)(.*?)(\(Automated\)|\(Manual\))', 0)
            WHEN 'win2019' THEN regexp_extract(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG))\)(.*?)(\(Automated\)|\(Manual\))', 0)
            WHEN 'win10' THEN regexp_extract(text, '(?s)(\d+(?:\.\d+)+)\s\(((L[12])|(NG)|(BL))\)(.*?)(\(Automated\)|\(Manual\))', 0)
            ELSE regexp_extract(text, '(?s)CIS(.*)Benchmark', 1) END AS v_rule,
    CASE WHEN strpos(text, 'Profile Applicability:') > 0 THEN regexp_replace(trim(CASE WHEN strpos(substr(text, strpos(text, 'Profile Applicability:') + 22), 'Description:') = 0
         THEN substr(text, strpos(text, 'Profile Applicability:') + 22)
         ELSE substr(substr(text, strpos(text, 'Profile Applicability:') + 22), 1,
              strpos(substr(text, strpos(text, 'Profile Applicability:') + 22), 'Description:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), '[^a-zA-Z0-9\n-]+', ' ', 'g') END AS v_level,
    CASE WHEN strpos(text, 'Description:') > 0 THEN trim(CASE WHEN strpos(substr(text, strpos(text, 'Description:') + 12), 'Rationale') = 0
         THEN substr(text, strpos(text, 'Description:') + 12)
         ELSE substr(substr(text, strpos(text, 'Description:') + 12), 1,
              strpos(substr(text, strpos(text, 'Description:') + 12), 'Rationale') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) END AS v_desc,
    CASE WHEN strpos(text, 'Rationale:') > 0 THEN trim(CASE WHEN strpos(substr(text, strpos(text, 'Rationale:') + 10), 'Audit:') = 0
         THEN substr(text, strpos(text, 'Rationale:') + 10)
         ELSE substr(substr(text, strpos(text, 'Rationale:') + 10), 1,
              strpos(substr(text, strpos(text, 'Rationale:') + 10), 'Audit:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) END AS v_rat,
    CASE WHEN strpos(text, '
Audit:') > 0 THEN trim(CASE WHEN strpos(substr(text, strpos(text, '
Audit:') + 7), 'Remediation') = 0
         THEN substr(text, strpos(text, '
Audit:') + 7)
         ELSE substr(substr(text, strpos(text, '
Audit:') + 7), 1,
              strpos(substr(text, strpos(text, '
Audit:') + 7), 'Remediation') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) END AS v_audit,
    CASE WHEN strpos(text, 'Remediation:') > 0 THEN trim(CASE WHEN strpos(substr(text, strpos(text, 'Remediation:') + 12), 'Default Value:') = 0
         THEN substr(text, strpos(text, 'Remediation:') + 12)
         ELSE substr(substr(text, strpos(text, 'Remediation:') + 12), 1,
              strpos(substr(text, strpos(text, 'Remediation:') + 12), 'Default Value:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) END AS v_rem,
    CASE WHEN strpos(text, 'Default Value:') > 0 THEN trim(CASE WHEN strpos(substr(text, strpos(text, 'Default Value:') + 14), 'CIS Controls:') = 0
         THEN substr(text, strpos(text, 'Default Value:') + 14)
         ELSE substr(substr(text, strpos(text, 'Default Value:') + 14), 1,
              strpos(substr(text, strpos(text, 'Default Value:') + 14), 'CIS Controls:') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)) END AS v_defval,
    CASE WHEN strpos(text, 'CIS Controls:') > 0 THEN regexp_replace(trim(CASE WHEN strpos(substr(text, strpos(text, 'CIS Controls:') + 13), 'P a g e') = 0
         THEN substr(text, strpos(text, 'CIS Controls:') + 13)
         ELSE substr(substr(text, strpos(text, 'CIS Controls:') + 13), 1,
              strpos(substr(text, strpos(text, 'CIS Controls:') + 13), 'P a g e') - 1) END, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11) || chr(28) || chr(29) || chr(30) || chr(31) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)), '[^a-zA-Z0-9\n.-]+', ' ', 'g') END AS v_cis
  FROM pages),
cum AS MATERIALIZED (SELECT *,
    SUM(CASE WHEN m_rule THEN 1 ELSE 0 END) OVER w AS c_rule,
    SUM(CASE WHEN v_level IS NOT NULL THEN 1 ELSE 0 END) OVER w AS c_level,
    SUM(CASE WHEN v_desc IS NOT NULL THEN 1 ELSE 0 END) OVER w AS c_desc,
    SUM(CASE WHEN v_rat IS NOT NULL THEN 1 ELSE 0 END) OVER w AS c_rat,
    SUM(CASE WHEN v_audit IS NOT NULL THEN 1 ELSE 0 END) OVER w AS c_audit,
    SUM(CASE WHEN v_rem IS NOT NULL THEN 1 ELSE 0 END) OVER w AS c_rem,
    SUM(CASE WHEN v_cis IS NOT NULL THEN 1 ELSE 0 END) OVER w AS c_cis,
    last_value(CASE WHEN m_rule THEN v_rule END IGNORE NULLS) OVER w AS l_rule,
    last_value(v_level IGNORE NULLS) OVER w AS l_level,
    last_value(v_desc IGNORE NULLS) OVER w AS l_desc,
    last_value(v_rat IGNORE NULLS) OVER w AS l_rat,
    last_value(v_audit IGNORE NULLS) OVER w AS l_audit,
    last_value(v_rem IGNORE NULLS) OVER w AS l_rem,
    last_value(v_cis IGNORE NULLS) OVER w AS l_cis
  FROM px
  WINDOW w AS (PARTITION BY conv_id ORDER BY rn ROWS UNBOUNDED PRECEDING)),
dv AS (
  SELECT conv_id, rn, c_cis,
    (CASE WHEN v_defval IS NOT NULL THEN 1 ELSE 0 END)
      + (CASE WHEN v_cis IS NOT NULL AND (CASE WHEN v_defval IS NOT NULL THEN 1 ELSE 0 END) = c_cis - 1 THEN 1 ELSE 0 END) AS d,
    CASE WHEN v_cis IS NOT NULL AND (CASE WHEN v_defval IS NOT NULL THEN 1 ELSE 0 END) = c_cis - 1 THEN ''
         ELSE coalesce(v_defval, '') END AS v
  FROM cum WHERE rn = 1
  UNION ALL
  SELECT c.conv_id, c.rn, c.c_cis,
    dv.d + (CASE WHEN c.v_defval IS NOT NULL THEN 1 ELSE 0 END)
      + (CASE WHEN c.v_cis IS NOT NULL AND dv.d + (CASE WHEN c.v_defval IS NOT NULL THEN 1 ELSE 0 END) = c.c_cis - 1 THEN 1 ELSE 0 END) AS d,
    CASE WHEN c.v_cis IS NOT NULL AND dv.d + (CASE WHEN c.v_defval IS NOT NULL THEN 1 ELSE 0 END) = c.c_cis - 1 THEN ''
         WHEN c.v_defval IS NOT NULL THEN c.v_defval
         ELSE dv.v END AS v
  FROM dv JOIN cum c ON c.conv_id = dv.conv_id AND c.rn = dv.rn + 1),
aligned AS (SELECT cum.*, dv.v AS defval_val FROM cum JOIN dv ON cum.conv_id = dv.conv_id AND cum.rn = dv.rn
  WHERE c_rule > 0 AND c_rule = c_level AND c_rule = c_desc AND c_rule = c_rat
    AND c_rule = c_audit AND c_rule = c_rem),
emit AS (SELECT *, row_number() OVER (PARTITION BY conv_id, c_rule ORDER BY rn) AS e_rn FROM aligned)
SELECT conv_id, turn_idx::INTEGER AS turn_idx,
  coalesce(l_rule, '') AS rule, coalesce(l_level, '') AS profile_applicability,
  coalesce(l_desc, '') AS description, coalesce(l_rat, '') AS rationale,
  coalesce(l_audit, '') AS audit, coalesce(l_rem, '') AS remediation,
  defval_val AS default_value, coalesce(l_cis, '') AS cis_controls
FROM emit WHERE e_rn = 1"""
}
