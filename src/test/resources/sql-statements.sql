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

RUN: TRUNCATE TABLE '$T'
EXPECT: -

RUN: SELECT count(*) FROM gtab
EXPECT: 0
