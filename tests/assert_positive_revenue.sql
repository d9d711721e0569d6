-- Reconstruction of the reference's tests/assert_positive_revenue.sql
-- (an EMPTY 0-byte file — name-declared intent only): no customer's
-- lifetime value may be negative. Violating rows fail the test; twin of
-- the dq_summary singular branch (quality/DataQuality.scala
-- extraChecks), pinned equal by SingularTestsSpec.
SELECT customer_key, lifetime_value
FROM {{ ref('gold_customer_summary') }}
WHERE lifetime_value < 0
