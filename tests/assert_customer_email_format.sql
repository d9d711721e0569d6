-- Reconstruction of the reference's tests/assert_customer_email_format.sql
-- (an EMPTY 0-byte file — name-declared intent only): silver emails must
-- look like an address. Violating rows fail the test; the engine's
-- dq_summary folds the same predicate into its single-pass aggregate
-- (quality/DataQuality.scala extraChecks), and SingularTestsSpec pins
-- this loadable form to the same count.
SELECT customer_key, email
FROM {{ ref('silver_customers') }}
WHERE NOT (email LIKE '%@%.%')
