-- The accumulating fraud-report increment as ONE SQL script — the S10
-- surface: the reference executes this report from a .sql file
-- (reference database.py:42-46 get_script + etl.py:411) rather than
-- through an API. Faithful Spark-SQL translation of
-- trsh_rep_fraud_sync.sql:1-129 over the warehouse views; the INSERT
-- wrapper is the pipeline's append step, so the script is the SELECT.
-- :processed_dt replaces NOW() so batch replays are deterministic.

-- 1. Operation on an expired or blacklisted passport (sql:2-24),
--    including the OR-EXISTS correlated subquery.
SELECT      tr.trans_date AS event_dt
            ,cl.passport_num AS passport
            ,CONCAT_WS(' ', cl.first_name, cl.last_name, cl.patronymic) AS fio
            ,cl.phone
            ,1 AS event_type
            ,CAST(tr.create_dt AS DATE) AS report_dt
            ,CAST(:processed_dt AS TIMESTAMP_NTZ) AS processed_dt
FROM        fact_transaction AS tr
            INNER JOIN dim_cards_hist AS c ON tr.card_num = c.card_num
                AND tr.trans_date BETWEEN c.effective_from AND c.effective_to
            INNER JOIN dim_accounts_hist AS ac ON c.account_num = ac.account_num
                AND tr.trans_date BETWEEN ac.effective_from AND ac.effective_to
            INNER JOIN dim_clients_hist AS cl ON ac.client = cl.client_id
                AND tr.trans_date BETWEEN cl.effective_from AND cl.effective_to
WHERE       (tr.trans_date > cl.passport_valid_to
            OR EXISTS(  SELECT      1
                        FROM        fact_passport_blacklist AS p
                        WHERE       cl.passport_num = p.passport_num
                                    AND tr.trans_date > p.entry_dt))
            AND tr.create_dt > COALESCE((   SELECT      MAX(report_dt)
                                            FROM        rep_fraud)
                                        ,TO_DATE('1800-01-01', 'yyyy-MM-dd'))
UNION ALL
-- 2. Operation on an inactive contract (sql:26-44).
SELECT      tr.trans_date AS event_dt
            ,cl.passport_num AS passport
            ,CONCAT_WS(' ', cl.first_name, cl.last_name, cl.patronymic) AS fio
            ,cl.phone
            ,2 AS event_type
            ,CAST(tr.create_dt AS DATE) AS report_dt
            ,CAST(:processed_dt AS TIMESTAMP_NTZ) AS processed_dt
FROM        fact_transaction AS tr
            INNER JOIN dim_cards_hist AS c ON tr.card_num = c.card_num
                AND tr.trans_date BETWEEN c.effective_from AND c.effective_to
            INNER JOIN dim_accounts_hist AS ac ON c.account_num = ac.account_num
                AND tr.trans_date BETWEEN ac.effective_from AND ac.effective_to
                AND tr.trans_date > ac.valid_to
            INNER JOIN dim_clients_hist AS cl ON ac.client = cl.client_id
                AND tr.trans_date BETWEEN cl.effective_from AND cl.effective_to
WHERE       tr.create_dt > COALESCE((   SELECT      MAX(report_dt)
                                        FROM        rep_fraud)
                                    ,TO_DATE('1800-01-01', 'yyyy-MM-dd'))
UNION ALL
-- 3. Operations in different cities within one hour (sql:46-80).
SELECT      trans_date AS event_dt
            ,passport_num AS passport
            ,CONCAT_WS(' ', first_name, last_name, patronymic) AS fio
            ,phone
            ,3 AS event_type
            ,CAST(create_dt AS DATE) AS report_dt
            ,CAST(:processed_dt AS TIMESTAMP_NTZ) AS processed_dt
FROM        (
            SELECT      cl.client_id
                        ,cl.first_name
                        ,cl.last_name
                        ,cl.patronymic
                        ,cl.passport_num
                        ,cl.phone
                        ,t.terminal_city
                        ,tr.trans_date
                        ,LAG(t.terminal_city) OVER(PARTITION BY cl.client_id ORDER BY tr.trans_date) AS prv_city
                        ,LAG(tr.trans_date) OVER(PARTITION BY cl.client_id ORDER BY tr.trans_date) AS prv_dt
                        ,tr.create_dt
            FROM        fact_transaction AS tr
                        INNER JOIN dim_cards_hist AS c ON tr.card_num = c.card_num
                            AND tr.trans_date BETWEEN c.effective_from AND c.effective_to
                        INNER JOIN dim_accounts_hist AS ac ON c.account_num = ac.account_num
                            AND tr.trans_date BETWEEN ac.effective_from AND ac.effective_to
                        INNER JOIN dim_clients_hist AS cl ON ac.client = cl.client_id
                            AND tr.trans_date BETWEEN cl.effective_from AND cl.effective_to
                        INNER JOIN dim_terminals_hist AS t ON t.terminal_id = tr.terminal
                            AND tr.trans_date BETWEEN t.effective_from AND t.effective_to
                        ) AS a
WHERE       terminal_city <> prv_city
            AND trans_date < prv_dt + INTERVAL 1 HOUR
            AND create_dt > COALESCE((  SELECT      MAX(report_dt)
                                        FROM        rep_fraud)
                                    ,TO_DATE('1800-01-01', 'yyyy-MM-dd'))
UNION ALL
-- 4. Amount guessing: a chain of strictly decreasing attempts, all
--    rejected but the last; the final successful one is fraudulent
--    (sql:82-129).
SELECT      trans_date AS event_dt
            ,passport_num AS passport
            ,CONCAT_WS(' ', first_name, last_name, patronymic) AS fio
            ,phone
            ,4 AS event_type
            ,CAST(create_dt AS DATE) AS report_dt
            ,CAST(:processed_dt AS TIMESTAMP_NTZ) AS processed_dt
FROM        (
            SELECT      *
                        ,MIN(CASE WHEN amt < prv_amt THEN 1 ELSE 0 END) OVER(PARTITION BY client_id, card_num ORDER BY trans_date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS reducion
            FROM        (
                        SELECT      cl.client_id
                                    ,tr.card_num
                                    ,cl.first_name
                                    ,cl.last_name
                                    ,cl.patronymic
                                    ,cl.passport_num
                                    ,cl.phone
                                    ,tr.trans_date
                                    ,tr.trans_id
                                    ,tr.oper_type
                                    ,tr.oper_result
                                    ,tr.amt
                                    ,tr.create_dt
                                    ,LAG(tr.amt) OVER(PARTITION BY cl.client_id, tr.card_num ORDER BY tr.trans_date) AS prv_amt
                                    ,MIN(tr.trans_date) OVER(PARTITION BY cl.client_id, tr.card_num ORDER BY tr.trans_date ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS min_dt
                                    ,SUM(CASE WHEN tr.oper_type IN ('WITHDRAW', 'PAYMENT') AND tr.oper_result = 'REJECT' THEN 1 ELSE 0 END) OVER(PARTITION BY cl.client_id, tr.card_num ORDER BY tr.trans_date ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS oper
                        FROM        fact_transaction AS tr
                                    INNER JOIN dim_cards_hist AS c ON tr.card_num = c.card_num
                                        AND tr.trans_date BETWEEN c.effective_from AND c.effective_to
                                    INNER JOIN dim_accounts_hist AS ac ON c.account_num = ac.account_num
                                        AND tr.trans_date BETWEEN ac.effective_from AND ac.effective_to
                                    INNER JOIN dim_clients_hist AS cl ON ac.client = cl.client_id
                                        AND tr.trans_date BETWEEN cl.effective_from AND cl.effective_to
                                    ) AS a
                        ) AS b
WHERE       oper_type IN ('WITHDRAW', 'PAYMENT')
            AND oper_result = 'SUCCESS'
            AND oper = 3
            AND trans_date < min_dt + INTERVAL 20 MINUTE
            AND reducion = 1
            AND create_dt > COALESCE((  SELECT      MAX(report_dt)
                                        FROM        rep_fraud)
                                    ,TO_DATE('1800-01-01', 'yyyy-MM-dd'));
