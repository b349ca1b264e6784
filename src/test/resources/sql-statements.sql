-- Golden statement corpus (reference analog:
-- hudi-spark/src/test/resources/sql-statements.sql executed by
-- TestSqlStatement.scala). Each RUN line is executed through
-- spark.sql with the graft session extension active, against a MOR
-- scratch table seeded by the runner ($T = table path, gtab = its
-- catalog name). EXPECT gives the full sorted result (rows joined
-- with '|', columns with ','; nulls render as "null");
-- EXPECT_ROWS gives just a row count; "-" = only assert success.

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 1,a|2,b|3,c

RUN: UPDATE '$T' SET v = upper(v) WHERE id <= 2
EXPECT: -

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 1,A|2,B|3,c

RUN: UPDATE '$T' SET amount = amount * 2, v = concat(v, '!') WHERE id = 3
EXPECT: -

RUN: SELECT v, CAST(amount AS BIGINT) FROM gtab WHERE id = 3
EXPECT: c!,60

RUN: DELETE FROM '$T' WHERE id = 2
EXPECT: -

RUN: SELECT count(*) FROM gtab
EXPECT: 2

RUN: SHOW PARTITIONS '$T'
EXPECT: p1|p2

RUN: ALTER TABLE '$T' ADD COLUMNS (note string)
EXPECT: -

RUN: SELECT id, note FROM gtab ORDER BY id
EXPECT: 1,null|3,null

RUN: SCHEDULE COMPACTION ON '$T'
EXPECT_ROWS: 2

RUN: RUN COMPACTION ON '$T'
EXPECT_ROWS: 1

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 1,A|3,c!

RUN: SHOW COMPACTION ON '$T'
EXPECT_ROWS: 1

RUN: SCHEDULE CLUSTERING ON '$T' SORT BY (id)
EXPECT_ROWS: 2

RUN: RUN CLUSTERING ON '$T'
EXPECT_ROWS: 1

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 1,A|3,c!

RUN: SHOW CLUSTERING ON '$T'
EXPECT_ROWS: 1

RUN: TRUNCATE TABLE '$T'
EXPECT: -

RUN: SELECT count(*) FROM gtab
EXPECT: 0

-- ==== Spark-grammar DML on the CATALOG TABLE NAME (resolution rule:
-- ==== GraftDmlResolution routing MergeIntoTable / UpdateTable /
-- ==== DeleteFromTable / InsertIntoStatement into GraftDml)

RUN: INSERT INTO gtab VALUES (10, 'x', 5.0, 1, 'p1', null), (11, 'y', 6.0, 1, 'p2', null)
EXPECT: -

RUN: SELECT id, v, note FROM gtab ORDER BY id
EXPECT: 10,x,null|11,y,null

RUN: INSERT INTO gtab PARTITION (p = 'p3') VALUES (13, 'w', 7.0, 1, 'pn')
EXPECT: -

RUN: SELECT id, p, note FROM gtab WHERE id = 13
EXPECT: 13,p3,pn

RUN: UPDATE gtab SET v = concat(v, '2') WHERE id <= 11
EXPECT: -

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 10,x2|11,y2|13,w

RUN: DELETE FROM gtab WHERE id = 13
EXPECT: -

RUN: SELECT count(*) FROM gtab
EXPECT: 2

RUN: MERGE INTO gtab USING (SELECT 10 AS id, 'm' AS v, 1.0 AS amount, 2 AS ts, 'p1' AS p, 'n1' AS note UNION ALL SELECT 12, 'z', 2.0, 2, 'p2', null) s ON gtab.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v, note = s.note WHEN NOT MATCHED THEN INSERT *
EXPECT: -

RUN: SELECT id, v, note FROM gtab ORDER BY id
EXPECT: 10,m,n1|11,y2,null|12,z,null

RUN: MERGE INTO gtab t USING (SELECT 11 AS id) s ON t.id = s.id WHEN MATCHED THEN DELETE
EXPECT: -

RUN: SELECT id FROM gtab ORDER BY id
EXPECT: 10|12

RUN: INSERT OVERWRITE gtab VALUES (20, 'o', 9.0, 3, 'p1', null)
EXPECT: -

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 12,z|20,o

RUN: SHOW COMMITS '$T'
EXPECT: -

RUN: SHOW FSVIEW '$T'
EXPECT: -

RUN: SHOW SAVEPOINTS '$T'
EXPECT_ROWS: 0

RUN: SHOW ROLLBACKS '$T'
EXPECT_ROWS: 0

RUN: SHOW CLEANS '$T'
EXPECT_ROWS: 0

RUN: EXPORT TABLE '$T' TO '$T-export' FORMAT parquet
EXPECT: 2

RUN: COPY TABLE '$T' TO '$T-backup'
EXPECT: -

RUN: RUN TTL ON '$T' EXPIRE BELOW 'p2' DRY RUN
EXPECT: p1

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 12,z|20,o

RUN: RUN TTL ON '$T' EXPIRE BELOW 'p2'
EXPECT: p1

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 12,z

RUN: RUN TTL ON '$T' EXPIRE BELOW 'p2'
EXPECT_ROWS: 0

-- ==== lifecycle verbs through the injected spark.sql parser (the
-- ==== extension path users actually hit): on-demand checkpoint,
-- ==== checkpoint listing, typed-TTL guard rail, archive on top of an
-- ==== existing same-instant checkpoint (idempotent promote)

RUN: RUN CHECKPOINT ON '$T'
EXPECT_ROWS: 1

RUN: SHOW CHECKPOINTS '$T'
EXPECT_ROWS: 1

RUN: RUN CHECKPOINT ON '$T'
EXPECT_ROWS: 0

RUN: RUN TTL ON '$T' EXPIRE OLDER THAN 30 DAYS DRY RUN
EXPECT_ERROR: date-formatted

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 12,z

RUN: RUN ARCHIVE ON '$T' KEEP 2 3
EXPECT_ROWS: 1

RUN: SELECT id, v FROM gtab ORDER BY id
EXPECT: 12,z
