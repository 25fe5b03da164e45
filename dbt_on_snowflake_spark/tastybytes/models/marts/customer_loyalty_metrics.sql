-- Loyalty metrics: per-customer spend + distinct visited locations
-- (reference dbt/models/marts/customer_loyalty_metrics.sql:1-15).
-- ARRAY_AGG(DISTINCT ...) in Snowflake is an unordered set; we sort the
-- collected set (array_sort(collect_set(...))) so results are
-- deterministic — SURVEY §7.4's documented deviation.
SELECT
    cl.customer_id,
    cl.city,
    cl.country,
    cl.first_name,
    cl.last_name,
    cl.phone_number,
    cl.e_mail,
    SUM(oh.order_total) AS total_sales,
    ARRAY_SORT(COLLECT_SET(oh.location_id)) AS visited_location_ids_array
FROM {{ ref('raw_customer_customer_loyalty') }} cl
JOIN {{ ref('raw_pos_order_header') }} oh
    ON cl.customer_id = oh.customer_id
GROUP BY cl.customer_id, cl.city, cl.country, cl.first_name,
         cl.last_name, cl.phone_number, cl.e_mail
